"""Weight converters: Keras-h5 / timm-torch -> JAX variable pytrees.

Parity surface: tfimm transfer rules (models/factory.py:163-269,
utils/timm.py:39-100) and kecam ``download_and_load.py`` torch state-dict
alignment. Our converters map *names*, never execute foreign graphs.
"""

from .keras_h5 import (  # noqa: F401
    apply_weight_mapper,
    convert_keras_h5,
    read_keras_h5,
    register_weight_mapper,
)
from .savedmodel import convert_savedmodel, read_savedmodel  # noqa: F401
from .torch_pt import (  # noqa: F401
    convert_torch_weights,
    read_torch_checkpoint,
    register_torch_mapper,
)
