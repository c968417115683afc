from .losses import (  # noqa: F401
    balanced_accuracy,
    binary_accuracy,
    binary_cross_entropy_timm,
    categorical_cross_entropy,
    distill_kl_divergence,
)
from .logging import MetricLogger  # noqa: F401
from .mixup import cutmix, do_mixup_token, mixup, mixup_cutmix, rand_bbox_token  # noqa: F401
from .token_label import build_token_labels, token_label_align  # noqa: F401
from .optimizers import create_optimizer, weight_decay_mask  # noqa: F401
from .sam import sam_gradient  # noqa: F401
from .schedules import (  # noqa: F401
    CosineLrScheduler,
    constant_scheduler,
    cosine_decay,
    cosine_decay_restarts,
    exp_scheduler,
    multistep_schedule,
)
from .trainer import TrainConfig, Trainer  # noqa: F401
