# NOTE: an earlier fused u8->resize->normalize "preprocess" kernel was
# removed: XLA already fuses the cast/normalize into the resize matmuls and
# the kernel never beat that path on v5e — an unwired kernel is inventory,
# not a component.
from .window_attention import window_attention  # noqa: F401
from .convnext_block import (  # noqa: F401
    blockdiag_dw7x7,
    fused_convnext_block,
    fused_ln_mlp_residual,
)
