from .config import DotDict, load_config, save_config

__all__ = ["DotDict", "load_config", "save_config"]
