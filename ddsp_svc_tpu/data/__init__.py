from .dataset import AudioDataset, BatchSampler, get_datasets  # noqa: F401
from .preprocess import preprocess  # noqa: F401
