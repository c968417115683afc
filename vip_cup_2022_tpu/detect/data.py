"""Detection data pipeline (reference coco/data.py).

Host-side numpy ops feeding static (image, (bboxes, labels)) tensors to the
jitted train step — the same split as the reference's tf.data stage:
- ``letterbox_resize`` aspect-preserving resize + pad (:96-124 role)
- ``random_flip_left_right_with_bboxes`` (:127-134)
- ``random_hsv`` hue/saturation/brightness jitter (:137-155)
- ``mosaic_mix_batch`` 4-way mosaic with bbox re-ranging (:161-205)
- ``pad_bboxes_labels`` fixed max_labels_per_image padding with validity flag
- ``DetectionLoader``: batches images + padded targets for either
  anchor/assignment mode

Bboxes are [top, left, bottom, right] normalized to [0, 1] throughout (the
reference convention).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def _resize_bilinear(image: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(image, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    except Exception:  # pragma: no cover
        from ..ops.resize import resize
        import numpy as _np

        return _np.asarray(resize(image.astype(np.float32), out_hw, method="bilinear"))


def letterbox_resize(image, target_shape, pad_value=114, centered=True):
    """Aspect-preserving resize + pad to target_shape. Returns
    (image, scale, pad_top, pad_left)."""
    hh, ww = image.shape[:2]
    th, tw = target_shape
    scale = min(th / hh, tw / ww)
    nh, nw = int(round(hh * scale)), int(round(ww * scale))
    resized = _resize_bilinear(image, (nh, nw))
    pad_top = (th - nh) // 2 if centered else 0
    pad_left = (tw - nw) // 2 if centered else 0
    out = np.full((th, tw, image.shape[-1]), pad_value, resized.dtype)
    out[pad_top : pad_top + nh, pad_left : pad_left + nw] = resized
    return out, scale, pad_top, pad_left


def adjust_bboxes_for_letterbox(bboxes, src_hw, scale, pad_top, pad_left, dst_hw):
    """Map [0,1] bboxes from the source frame into the letterboxed frame."""
    bboxes = np.asarray(bboxes, np.float32).reshape(-1, 4)
    abs_boxes = bboxes * [src_hw[0], src_hw[1], src_hw[0], src_hw[1]]
    abs_boxes = abs_boxes * scale + [pad_top, pad_left, pad_top, pad_left]
    return abs_boxes / [dst_hw[0], dst_hw[1], dst_hw[0], dst_hw[1]]


def random_flip_left_right_with_bboxes(image, bboxes, probability=0.5, rng=None):
    """(coco/data.py:127-134) left = 1 - right, right = 1 - left."""
    rng = rng or np.random
    if rng.uniform() >= probability:
        return image, bboxes
    flipped = image[:, ::-1]
    bboxes = np.asarray(bboxes, np.float32)
    out = bboxes[:, [0, 3, 2, 1]] * [1, -1, 1, -1] + [0, 1, 0, 1]
    return flipped, out


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = np.max(x, -1)
    minc = np.min(x, -1)
    v = maxc
    d = maxc - minc
    s = np.where(maxc > 0, d / np.maximum(maxc, 1e-12), 0.0)
    rc = (maxc - r) / np.maximum(d, 1e-12)
    gc = (maxc - g) / np.maximum(d, 1e-12)
    bc = (maxc - b) / np.maximum(d, 1e-12)
    h = np.where(maxc == r, bc - gc, np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = np.where(d == 0, 0.0, (h / 6.0) % 1.0)
    return np.stack([h, s, v], -1)


def _hsv_to_rgb(x):
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return np.stack([r, g, b], -1)


def random_hsv(image, hue_delta=0.015, saturation_delta=0.7, brightness_delta=0.4, rng=None):
    """(coco/data.py:137-155) yolor augment_hsv: random hue shift, saturation
    scale, brightness shift on [0,1] float images."""
    rng = rng or np.random
    hsv = _rgb_to_hsv(np.clip(image, 0.0, 1.0))
    hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue_delta, hue_delta)) % 1.0
    hsv[..., 1] = np.clip(hsv[..., 1] * rng.uniform(1 - saturation_delta, 1 + saturation_delta), 0, 1)
    out = _hsv_to_rgb(hsv) + rng.uniform(-brightness_delta, brightness_delta)
    return np.clip(out, 0.0, 1.0)


def _largest_crop_and_resize(image, out_hw, rng):
    """random_largest_crop_and_resize_images role: largest aspect-matching
    crop at a random offset, resized to out_hw. Returns (img, scale, ct, cl)."""
    hh, ww = image.shape[:2]
    th, tw = out_hw
    scale = max(th / hh, tw / ww)
    ch, cw = min(hh, int(round(th / scale))), min(ww, int(round(tw / scale)))
    ct = rng.randint(0, hh - ch + 1)
    cl = rng.randint(0, ww - cw + 1)
    crop = image[ct : ct + ch, cl : cl + cw]
    return _resize_bilinear(crop, (th, tw)), scale, ct, cl


def mosaic_mix_batch(images, bboxes, labels, split_center_min=0.25,
                     split_center_max=0.75, rng=None):
    """(coco/data.py:161-205) 4-way mosaic over a batch: random split center,
    each quadrant a random-largest-crop of a shuffled batch pick, bboxes
    rescaled/clipped into the quadrant, zeroed when fully clipped."""
    rng = rng or np.random
    images = np.asarray(images)
    bboxes = np.asarray(bboxes, np.float32)
    labels = np.asarray(labels)
    b, hh, ww = images.shape[:3]
    split_hh = int(rng.uniform(split_center_min * hh, split_center_max * hh))
    split_ww = int(rng.uniform(split_center_min * ww, split_center_max * ww))

    starts = [(0, 0), (0, split_ww), (split_hh, 0), (split_hh, split_ww)]
    ends = [(split_hh, split_ww), (split_hh, ww), (hh, split_ww), (hh, ww)]
    quad_imgs, quad_boxes, quad_labels = [], [], []
    for (top, left), (bottom, right) in zip(starts, ends):
        sub_hh, sub_ww = bottom - top, right - left
        pick = rng.permutation(b)
        cur_imgs, cur_bb, cur_lb = [], [], []
        for i in pick:
            img_i, s, ct, cl = _largest_crop_and_resize(images[i], (sub_hh, sub_ww), rng)
            ih, iw = images[i].shape[:2]
            bb = bboxes[i] * [ih, iw, ih, iw]
            bb = (bb - [ct, cl, ct, cl]) * s
            bb = np.clip(bb, 0, [sub_hh, sub_ww, sub_hh, sub_ww])
            keep = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1]) != 0
            bb = bb + [top, left, top, left]
            bb = bb * keep[:, None]
            lb = np.where(keep, labels[i], np.zeros_like(labels[i]))
            cur_imgs.append(img_i)
            cur_bb.append(bb)
            cur_lb.append(lb)
        quad_imgs.append(np.stack(cur_imgs))
        quad_boxes.append(np.stack(cur_bb))
        quad_labels.append(np.stack(cur_lb))

    top_row = np.concatenate([quad_imgs[0], quad_imgs[1]], axis=2)
    bottom_row = np.concatenate([quad_imgs[2], quad_imgs[3]], axis=2)
    mixed = np.concatenate([top_row, bottom_row], axis=1)
    mixed_boxes = np.concatenate(quad_boxes, axis=1) / [hh, ww, hh, ww]
    mixed_labels = np.concatenate(quad_labels, axis=1)
    return mixed, (mixed_boxes.astype(np.float32), mixed_labels)


def pad_bboxes_labels(bboxes, labels, num_classes, max_labels_per_image=100):
    """Pack (bboxes, int labels) into the loss target layout
    (max_labels, 4 + num_classes + 1) with a trailing validity flag."""
    bboxes = np.asarray(bboxes, np.float32).reshape(-1, 4)
    labels = np.asarray(labels).reshape(-1)
    n = min(len(bboxes), max_labels_per_image)
    out = np.zeros((max_labels_per_image, 4 + num_classes + 1), np.float32)
    if n:
        out[:n, :4] = bboxes[:n]
        out[np.arange(n), 4 + labels[:n].astype(int)] = 1.0
        out[:n, -1] = 1.0
    return out


class DetectionLoader:
    """Minimal host-side detection batch loader (RandomProcessImageWithBboxes
    + init_dataset role, coco/data.py:213-504): letterbox resize, optional
    flip/hsv/mosaic, fixed-shape padded targets."""

    def __init__(self, images, bboxes, labels, num_classes,
                 batch_size=8, target_shape=(416, 416), max_labels_per_image=100,
                 use_flip=True, use_hsv=True, use_mosaic=0.5, seed=0):
        self.images, self.bboxes, self.labels = images, bboxes, labels
        self.num_classes, self.batch_size = num_classes, batch_size
        self.target_shape, self.max_labels = target_shape, max_labels_per_image
        self.use_flip, self.use_hsv, self.use_mosaic = use_flip, use_hsv, use_mosaic
        self.rng = np.random.RandomState(seed)

    def __iter__(self):
        order = self.rng.permutation(len(self.images))
        for s in range(0, len(order) - self.batch_size + 1, self.batch_size):
            ids = order[s : s + self.batch_size]
            imgs, bbs, lbs = [], [], []
            for i in ids:
                img = np.asarray(self.images[i], np.float32)
                if img.max() > 1.5:
                    img = img / 255.0
                src_hw = img.shape[:2]
                img, scale, pt, pl = letterbox_resize(img, self.target_shape, pad_value=114 / 255.0)
                bb = adjust_bboxes_for_letterbox(self.bboxes[i], src_hw, scale, pt, pl, self.target_shape)
                if self.use_flip:
                    img, bb = random_flip_left_right_with_bboxes(img, bb, rng=self.rng)
                if self.use_hsv:
                    img = random_hsv(img, rng=self.rng)
                imgs.append(img)
                bbs.append(bb)
                lbs.append(np.asarray(self.labels[i]))
            n_max = max(len(b) for b in bbs)
            bb_pad = np.zeros((len(ids), n_max, 4), np.float32)
            lb_pad = np.zeros((len(ids), n_max), np.int64)
            for j, (b, l) in enumerate(zip(bbs, lbs)):
                bb_pad[j, : len(b)] = b
                lb_pad[j, : len(l)] = l
            imgs = np.stack(imgs)
            if self.use_mosaic and self.rng.uniform() < self.use_mosaic:
                imgs, (bb_pad, lb_pad) = mosaic_mix_batch(imgs, bb_pad, lb_pad, rng=self.rng)
            targets = np.stack([
                pad_bboxes_labels(bb_pad[j][lb_pad[j] > 0] if (lb_pad[j] > 0).any() else bb_pad[j][:0],
                                  lb_pad[j][lb_pad[j] > 0] - 1, self.num_classes, self.max_labels)
                for j in range(len(imgs))
            ])
            yield imgs, targets
