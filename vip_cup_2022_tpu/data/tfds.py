"""TFDS dataset integration (reference imagenet/data.py:404-504 and tfimm
train/datasets/tfds.py:16-30).

``init_dataset`` reproduces the reference pipeline composition — TFDS load
with ``try_gcs`` on TPU, shuffle, per-sample random-crop-and-resize + flip,
batching with ``drop_remainder`` on TPU, rescale-mode normalization, one-hot
labels, optional mixup/cutmix, and the central-crop eval pipeline — but
yields NUMPY batches: in the TPU-native stack the device work lives in the
jitted train step (train/trainer.py), and the host pipeline's only job is to
feed sharded batches. RandAugment/AutoAugment (``magnitude`` / ``policy``)
run as the batched JAX ops from data/randaugment.py on the host CPU backend.

``tensorflow`` / ``tensorflow_datasets`` are imported lazily; without them a
clear error points at the custom-JSON loader, which has no TF dependency.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

IMAGENET_TF_RESCALE = (127.5, 127.5)  # x/127.5 - 1
IMAGENET_TORCH_MEAN = (0.485 * 255, 0.456 * 255, 0.406 * 255)
IMAGENET_TORCH_STD = (0.229 * 255, 0.224 * 255, 0.225 * 255)


def init_mean_std_by_rescale_mode(rescale_mode):
    """(mean, std) in the 0-255 domain (data.py init_mean_std_by_rescale_mode)."""
    if isinstance(rescale_mode, (tuple, list)):
        return float(rescale_mode[0]), float(rescale_mode[1])
    if rescale_mode == "tf":
        return IMAGENET_TF_RESCALE
    if rescale_mode == "torch":
        return np.array(IMAGENET_TORCH_MEAN, np.float32), np.array(IMAGENET_TORCH_STD, np.float32)
    if rescale_mode in ("raw", None):
        return 0.0, 1.0
    if rescale_mode == "raw01":
        return 0.0, 255.0
    raise ValueError(f"unknown rescale_mode {rescale_mode!r}")


def _load_tfds(data_name: str, try_gcs: bool):
    try:
        import tensorflow_datasets as tfds  # noqa: F401 — gated optional dep
    except ImportError as e:
        raise NotImplementedError(
            "init_dataset with a TFDS name requires tensorflow_datasets, "
            "which is not installed; use a custom-JSON dataset "
            "(data/train_pipeline.loaders_from_custom_json) instead"
        ) from e
    return tfds.load(data_name, with_info=True, try_gcs=try_gcs)


def init_dataset(
    data_name: str = "imagenet2012",
    input_shape: Tuple[int, int] = (224, 224),
    batch_size: int = 64,
    buffer_size: int = 1000,
    info_only: bool = False,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
    rescale_mode="tf",
    eval_central_crop: float = 1.0,
    random_crop_min: float = 1.0,
    resize_method: str = "bilinear",
    resize_antialias: bool = False,
    magnitude: int = 0,
    num_layers: int = 2,
    use_shuffle: bool = True,
    seed: Optional[int] = None,
    try_gcs: Optional[bool] = None,
    drop_remainder: Optional[bool] = None,
):
    """Reference-parity dataset builder. Returns
    ``(train_iter_fn, test_iter_fn, total_images, num_classes,
    steps_per_epoch)`` where the iter fns are re-iterable factories yielding
    ``(images_f32_normalized, one_hot_labels)`` numpy batches — directly
    consumable by train.Trainer.fit. With ``info_only`` returns
    ``(total_images, num_classes, steps_per_epoch, num_channels)``.
    """
    import jax

    is_tpu = jax.default_backend() == "tpu"
    try_gcs = is_tpu if try_gcs is None else try_gcs
    drop_remainder = is_tpu if drop_remainder is None else drop_remainder

    if data_name.endswith(".json"):
        # custom-JSON path (data.py:430-470): delegate to the TF-free host
        # loaders, wrapped to this function's return signature
        from .train_pipeline import loaders_from_custom_json, recognition_dataset_from_custom_json

        splits, total_images, num_classes = recognition_dataset_from_custom_json(
            data_name, with_info=True
        )
        steps_per_epoch = int(np.ceil(len(splits["train"][0]) / float(batch_size)))
        if info_only:
            return total_images, num_classes, steps_per_epoch, 3
        train, test, _ = loaders_from_custom_json(
            data_name, batch_size=batch_size, target_shape=tuple(input_shape[:2])
        )
        return (lambda: iter(train)), (lambda: iter(test)), total_images, num_classes, steps_per_epoch

    dataset, info = _load_tfds(data_name, try_gcs)
    num_classes = info.features["label"].num_classes
    num_channels = info.features["image"].shape[-1]
    total_images = info.splits["train"].num_examples
    steps_per_epoch = int(np.ceil(total_images / float(batch_size)))
    if info_only:
        return total_images, num_classes, steps_per_epoch, num_channels

    import tensorflow as tf

    mean, std = init_mean_std_by_rescale_mode(rescale_mode)
    h, w = input_shape[:2]

    def train_pre_batch(datapoint):
        img = tf.cast(datapoint["image"], tf.float32)
        if 0.0 < random_crop_min < 1.0:
            # timm-equivalent random crop fraction (data.py:33-80)
            shape = tf.shape(img)
            area = tf.cast(shape[0] * shape[1], tf.float32)
            target = tf.random.uniform((), random_crop_min, 1.0) * area
            ratio = tf.random.uniform((), 3.0 / 4.0, 4.0 / 3.0)
            cw = tf.minimum(tf.cast(tf.sqrt(target * ratio), tf.int32), shape[1])
            ch = tf.minimum(tf.cast(tf.sqrt(target / ratio), tf.int32), shape[0])
            img = tf.image.random_crop(img, (ch, cw, tf.shape(img)[-1]))
        img = tf.image.resize(
            img, (h, w), method=resize_method, antialias=resize_antialias
        )
        img = tf.image.random_flip_left_right(img)
        return img, datapoint["label"]

    def test_pre_batch(datapoint):
        # evaluation central crop-then-resize (data.py:309 semantics)
        img = tf.cast(datapoint["image"], tf.float32)
        if 0.0 < eval_central_crop < 1.0:
            img = tf.image.central_crop(img, eval_central_crop)
        img = tf.image.resize(img, (h, w), method=resize_method, antialias=resize_antialias)
        return img, datapoint["label"]

    autotune = tf.data.AUTOTUNE
    train_ds = dataset["train"]
    if use_shuffle:
        train_ds = train_ds.shuffle(buffer_size, seed=seed)
    train_ds = train_ds.map(train_pre_batch, num_parallel_calls=autotune)
    train_ds = train_ds.batch(batch_size, drop_remainder=drop_remainder)
    train_ds = train_ds.prefetch(autotune)

    test_tf = dataset.get("validation", dataset.get("test", None))
    if test_tf is not None:
        test_tf = test_tf.map(test_pre_batch, num_parallel_calls=autotune)
        test_tf = test_tf.batch(batch_size, drop_remainder=drop_remainder)

    rng_holder = {"step": 0}

    def _post(images, labels, train: bool):
        images = np.asarray(images, np.float32)
        labels = np.asarray(labels)
        if train and magnitude > 0:
            import jax.numpy as jnp

            from .randaugment import rand_augment

            key = jax.random.PRNGKey((seed or 0) * 100003 + rng_holder["step"])
            rng_holder["step"] += 1
            images = np.asarray(
                rand_augment(
                    key, jnp.asarray(images / 255.0), num_layers=num_layers,
                    magnitude=float(magnitude),
                )
            ) * 255.0
        images = (images - mean) / std
        onehot = np.eye(num_classes, dtype=np.float32)[labels]
        if train and (mixup_alpha or cutmix_alpha):
            import jax.numpy as jnp

            from ..train.mixup import mixup_cutmix

            key = jax.random.PRNGKey((seed or 0) * 7919 + rng_holder["step"])
            rng_holder["step"] += 1
            xm, ym = mixup_cutmix(
                key, jnp.asarray(images), jnp.asarray(onehot), mixup_alpha, cutmix_alpha
            )
            images, onehot = np.asarray(xm), np.asarray(ym)
        return images, onehot

    def train_iter_fn():
        for images, labels in train_ds.as_numpy_iterator():
            yield _post(images, labels, train=True)

    def test_iter_fn():
        if test_tf is None:
            return
        for images, labels in test_tf.as_numpy_iterator():
            yield _post(images, labels, train=False)

    return train_iter_fn, test_iter_fn, total_images, num_classes, steps_per_epoch
