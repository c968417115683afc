from .augment import apply_augment  # noqa: F401
from .decode import ImageDecoder, decode_image  # noqa: F401
from .pipeline import BatchLoader, build_dataset, seeding  # noqa: F401
