"""Flat op namespace (the kecam ``attention_layers/__init__.py`` role: one
import surface re-exporting every shared primitive)."""

from .act import ACTIVATIONS, NON_LINEAR_GAMMA, apply_activation, get_activation  # noqa: F401
from .conv import (  # noqa: F401
    AntiAliasDownsample,
    Conv,
    DepthwiseConv,
    ScaledStdConv,
    StdConv,
    ZeroInitGain,
    make_divisible,
)
from .drop import DropPath, drop_connect_rates_split  # noqa: F401
from .mlp import GatedMlp, GluMlp, Mlp, SpatialGatingUnit  # noqa: F401
from .norms import (  # noqa: F401
    BatchNorm,
    BatchNormAct,
    ChannelAffine,
    EvoNorm,
    GroupNorm,
    LayerNorm,
)
from .pad import resolve_padding, symmetric_padding, to_tuple  # noqa: F401
from .resize import resize, resize_matrix, resize_positional_embedding  # noqa: F401
from .squeeze_excite import EcaModule, GlobalContext, SEModule  # noqa: F401
from .window import (  # noqa: F401
    crop_from_window,
    pad_to_window,
    window_partition,
    window_reverse,
)
