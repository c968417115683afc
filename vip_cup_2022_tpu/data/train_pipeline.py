"""Training/eval data pipeline.

Parity surface: kecam imagenet/data.py —
- timm-equivalent ``random_crop_fraction`` (:33-54; log-distributed aspect)
- ``random_crop_and_resize_image`` (:57-80)
- per-pixel ``random_erasing`` (:83-105; normal noise at ImageNet stats)
- eval central-crop + resize (:309-324)
- ``RandomProcessDatapoint`` per-sample chain (:218-306): crop/resize -> flip
  -> RandAugment (device-side here) -> erasing
- ``init_dataset`` train/test builder (:404-504)

Host/device split (TPU-native): variable-size crops happen on host numpy at
decode time (shapes must be static under jit); RandAugment / mixup / erasing
run on device inside the jitted train step.
"""
from __future__ import annotations

import math
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from ..ops.resize import resize_matrix
from .decode import ImageDecoder, decode_image


def random_crop_fraction(rng: np.random.RandomState, size, scale=(0.08, 1.0), ratio=(0.75, 1.3333333), log_distribute=True):
    """timm RRC box sampler, kecam variant (data.py:33-54): scale_max capped so
    the ratio range stays feasible; aspect sampled log-uniform."""
    height, width = float(size[0]), float(size[1])
    area = height * width
    scale_max = min(height * height * ratio[1] / area, width * width / ratio[0] / area, scale[1])
    target_area = rng.uniform(scale[0], scale_max) * area
    ratio_min = max(target_area / (height * height), ratio[0])
    ratio_max = min(width * width / target_area, ratio[1])
    if log_distribute:
        aspect = math.exp(rng.uniform(math.log(ratio_min), math.log(ratio_max)))
    else:
        aspect = rng.uniform(ratio_min, ratio_max)
    ww = int(math.floor(math.sqrt(target_area * aspect)))
    hh = int(math.floor(math.sqrt(target_area / aspect)))
    return hh, ww


def _host_resize(img: np.ndarray, size, method="bilinear") -> np.ndarray:
    h, w = img.shape[:2]
    oh, ow = size
    x = img.astype(np.float32)
    if h != oh:
        x = np.einsum("oh,hwc->owc", resize_matrix(h, oh, method), x)
    if w != ow:
        x = np.einsum("ow,hwc->hoc", resize_matrix(w, ow, method), x)
    return x


def random_crop_and_resize_image(
    rng: np.random.RandomState, image: np.ndarray, target_shape, scale=(0.08, 1.0),
    ratio=(0.75, 1.3333333), method="bilinear",
):
    """data.py:57-80 — crop a random fraction then resize to target."""
    height, width = image.shape[:2]
    hh, ww = random_crop_fraction(rng, (height, width), scale, ratio)
    hh, ww = int(np.clip(hh, 1, height - 1)), int(np.clip(ww, 1, width - 1))
    top = rng.randint(0, height - hh) if height > hh else 0
    left = rng.randint(0, width - ww) if width > ww else 0
    crop = image[top : top + hh, left : left + ww]
    return _host_resize(crop, target_shape, method)


def central_crop_resize(image: np.ndarray, target_shape, central_crop=1.0, method="bilinear"):
    """Eval path (data.py:309-324): central crop of ``central_crop * min(h,w)``
    then resize."""
    if central_crop > 0:
        h, w = image.shape[:2]
        crop = int(central_crop * min(h, w))
        y, x = (h - crop) // 2, (w - crop) // 2
        image = image[y : y + crop, x : x + crop]
    return _host_resize(image, target_shape, method)


def random_erasing_per_pixel(
    rng: np.random.RandomState, image: np.ndarray, num_layers=1,
    scale=(0.02, 0.33333333), ratio=(0.3, 3.3333333), probability=0.5,
):
    """data.py:83-105 — rectangles filled with per-pixel normal noise at
    ImageNet [0,255] stats. Host version (image already target-sized)."""
    if rng.uniform() > probability:
        return image
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.120003, 57.375], np.float32)
    h, w = image.shape[:2]
    out = image.copy()
    for _ in range(num_layers):
        hh, ww = random_crop_fraction(rng, (h, w), scale=scale, ratio=ratio)
        hh, ww = min(hh, h - 1), min(ww, w - 1)
        top = rng.randint(0, h - hh) if h > hh else 0
        left = rng.randint(0, w - ww) if w > ww else 0
        noise = np.clip(rng.normal(mean, std, size=(hh, ww, 3)), 0.0, 255.0)
        out[top : top + hh, left : left + ww] = noise
    return out


class TrainLoader:
    """Labeled training batches: decode -> random-resized-crop -> hflip ->
    (optional host random erasing). Device-side augs (RandAugment, mixup)
    happen in the jitted train step. Yields (uint8 NHWC, one-hot labels)."""

    def __init__(
        self,
        paths: Sequence[str],
        labels: Sequence[int],
        nb_classes: int,
        batch_size: int,
        target_shape: Tuple[int, int] = (224, 224),
        random_crop_min: float = 0.08,
        magnitude: float = 0.0,  # <0 disables crop+flip too (kecam convention)
        random_erasing_prob: float = 0.0,
        resize_method: str = "bilinear",
        seed: int = 42,
        num_threads: int = 8,
        drop_remainder: bool = True,
    ):
        self.paths = list(paths)
        self.labels = np.asarray(labels, np.int64)
        self.nb_classes = nb_classes
        self.batch_size = batch_size
        self.target_shape = tuple(target_shape)
        self.random_crop_min = random_crop_min
        self.magnitude = magnitude
        self.random_erasing_prob = random_erasing_prob
        self.resize_method = resize_method
        self.rng = np.random.RandomState(seed)
        self._decoder = ImageDecoder(num_threads=num_threads)
        self.drop_remainder = drop_remainder

    def __len__(self):
        n = len(self.paths)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def _process(self, img: np.ndarray) -> np.ndarray:
        if self.magnitude >= 0:
            img = random_crop_and_resize_image(
                self.rng, img, self.target_shape,
                scale=(self.random_crop_min, 1.0), method=self.resize_method,
            )
            if self.rng.uniform() < 0.5:  # hflip (data.py RandomProcessDatapoint)
                img = img[:, ::-1]
        else:
            img = _host_resize(img, self.target_shape, self.resize_method)
        if self.random_erasing_prob > 0:
            img = random_erasing_per_pixel(self.rng, img, probability=self.random_erasing_prob)
        return np.clip(img, 0, 255).astype(np.uint8)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self.rng.permutation(len(self.paths))
        bs = self.batch_size
        for start in range(0, len(order) - (bs - 1 if self.drop_remainder else 0), bs):
            idx = order[start : start + bs]
            imgs = self._decoder.decode_batch([self.paths[i] for i in idx])
            batch = np.stack([self._process(im) for im in imgs])
            onehot = np.eye(self.nb_classes, dtype=np.float32)[self.labels[idx]]
            yield batch, onehot


class EvalLoader:
    """Eval batches with central-crop + resize (data.py:309-324)."""

    def __init__(
        self,
        paths: Sequence[str],
        labels: Sequence[int],
        nb_classes: int,
        batch_size: int,
        target_shape: Tuple[int, int] = (224, 224),
        central_crop: float = 0.95,
        resize_method: str = "bilinear",
        num_threads: int = 8,
    ):
        self.paths = list(paths)
        self.labels = np.asarray(labels, np.int64)
        self.nb_classes = nb_classes
        self.batch_size = batch_size
        self.target_shape = tuple(target_shape)
        self.central_crop = central_crop
        self.resize_method = resize_method
        self._decoder = ImageDecoder(num_threads=num_threads)

    def __iter__(self):
        bs = self.batch_size
        for start in range(0, len(self.paths), bs):
            chunk = list(range(start, min(start + bs, len(self.paths))))
            imgs = self._decoder.decode_batch([self.paths[i] for i in chunk])
            batch = np.stack(
                [
                    np.clip(
                        central_crop_resize(im, self.target_shape, self.central_crop, self.resize_method),
                        0, 255,
                    ).astype(np.uint8)
                    for im in imgs
                ]
            )
            onehot = np.eye(self.nb_classes, dtype=np.float32)[self.labels[chunk]]
            yield batch, onehot


def recognition_dataset_from_custom_json(data_path: str, with_info: bool = False):
    """Custom-JSON dataset loader (reference imagenet/data.py:344-364):
    {"train": [{"image": path, "label": int}, ...], "validation"|"test":
    [...], "info": {"num_classes": N}}. Returns {"train": (paths, labels),
    "<test_key>": (paths, labels)} (+ (total_images, num_classes) info)."""
    import json

    with open(data_path) as ff:
        aa = json.load(ff)
    test_key = "validation" if "validation" in aa else "test"
    train, test, info = aa["train"], aa[test_key], aa["info"]

    def split(items):
        return [ii["image"] for ii in items], [int(ii["label"]) for ii in items]

    dataset = {"train": split(train), test_key: split(test)}
    if with_info:
        return dataset, len(train), info["num_classes"]
    return dataset


def loaders_from_custom_json(data_path: str, batch_size: int = 32,
                             target_shape=(224, 224), **kwargs):
    """Build (TrainLoader, EvalLoader, num_classes) from a custom-JSON
    dataset file (init_dataset custom-json path, data.py:430-470 role)."""
    dataset, _, num_classes = recognition_dataset_from_custom_json(data_path, with_info=True)
    test_key = "validation" if "validation" in dataset else "test"
    train_paths, train_labels = dataset["train"]
    test_paths, test_labels = dataset[test_key]
    train = TrainLoader(train_paths, train_labels, num_classes, batch_size,
                        target_shape, **kwargs)
    test = EvalLoader(test_paths, test_labels, num_classes, batch_size, target_shape)
    return train, test, num_classes
