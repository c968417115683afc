"""Model zoo: importing this package registers every family (the reference's
``main.py:28-37`` imports all four zoos for layer registration; here one
registry serves the same role)."""

from . import aotnet  # noqa: F401
from . import beit  # noqa: F401
from . import cait  # noqa: F401
from . import cmt  # noqa: F401
from . import coat  # noqa: F401
from . import coatnet  # noqa: F401
from . import convnext  # noqa: F401
from . import davit  # noqa: F401
from . import edgenext  # noqa: F401
from . import efficientformer  # noqa: F401
from . import efficientnet  # noqa: F401
from . import efficientdet  # noqa: F401
from . import gcvit  # noqa: F401
from . import hornet  # noqa: F401
from . import levit  # noqa: F401
from . import mlp_family  # noqa: F401
from . import mobilenetv3  # noqa: F401
from . import mobilevit  # noqa: F401
from . import nat  # noqa: F401
from . import nfnets  # noqa: F401
from . import pit  # noqa: F401
from . import poolformer  # noqa: F401
from . import pvt  # noqa: F401
from . import vit  # noqa: F401
from . import yolor  # noqa: F401
from . import yolox  # noqa: F401
from . import volo  # noqa: F401
from . import regnet  # noqa: F401
from . import resnet_quad  # noqa: F401
from . import resnet_rs  # noqa: F401
from . import resnetv2  # noqa: F401
from . import uniformer  # noqa: F401
from . import swin  # noqa: F401
from . import timm_resnet  # noqa: F401
from . import swin_v2  # noqa: F401
from .base import ModelConfig  # noqa: F401
from .embedding_model import EmbeddingModel  # noqa: F401
from .factory import create_model, create_preprocessing, transfer_weights  # noqa: F401
from .registry import (  # noqa: F401
    is_model,
    list_models,
    model_class,
    model_config,
    model_entry,
    register_model,
)
