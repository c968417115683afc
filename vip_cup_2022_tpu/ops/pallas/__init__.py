from .window_attention import window_attention  # noqa: F401
from .preprocess import fused_preprocess  # noqa: F401
from .convnext_block import (  # noqa: F401
    blockdiag_dw7x7,
    fused_convnext_block,
    fused_ln_mlp_residual,
)
