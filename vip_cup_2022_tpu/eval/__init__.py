from .metrics import balanced_accuracy_score, top_k_accuracy  # noqa: F401
from .harness import evaluate_csv, evaluation, parity_diff  # noqa: F401
from .interop import JaxModelInterf, TorchModelInterf, parse_timm_log  # noqa: F401
