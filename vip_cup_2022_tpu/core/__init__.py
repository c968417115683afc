from .config import Config, dict2cfg, cfg2dict, NumpyEncoder  # noqa: F401
from .registry import Registry  # noqa: F401
