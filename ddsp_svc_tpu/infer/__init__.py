from .pipeline import SvcPipeline  # noqa: F401
from .realtime import RealtimeVC, phase_vocoder  # noqa: F401
