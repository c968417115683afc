from .augment import apply_augment  # noqa: F401
from .randaugment import auto_augment, rand_augment  # noqa: F401
from .decode import ImageDecoder, decode_image  # noqa: F401
from .pipeline import BatchLoader, build_dataset, seeding  # noqa: F401
from .train_pipeline import (  # noqa: F401
    EvalLoader,
    TrainLoader,
    loaders_from_custom_json,
    recognition_dataset_from_custom_json,
)
