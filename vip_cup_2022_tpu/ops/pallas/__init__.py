from .window_attention import window_attention  # noqa: F401
from .preprocess import fused_preprocess  # noqa: F401
