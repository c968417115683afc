"""int8 post-training quantization for TPU inference (XLA MXU int8 path).

TPU-native analogue of the reference's TFLite int8 conversion
(keras_cv_attention_models/model_surgery/model_surgery.py:569-629)."""
from .ptq import (  # noqa: F401
    PTQConfig,
    PTQState,
    calibrate,
    load_scales,
    quantized,
    save_scales,
)
