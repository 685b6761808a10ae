from .audio import load_wav, save_wav, to_mono  # noqa: F401
from .f0 import F0Extractor, yin_f0  # noqa: F401
from .hubert import ENCODER_CONFIGS, HubertModel, UnitsEncoder  # noqa: F401
from .slicer import Slicer, split_audio  # noqa: F401
from .volume import VolumeExtractor  # noqa: F401
