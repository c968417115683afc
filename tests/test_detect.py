"""Detection subsystem: anchors vs the reference generator, IoU, coder
roundtrip, assignment, focal loss, NMS."""
import numpy as np
import pytest

from vip_cup_2022_tpu.detect import (
    DecodePredictions,
    assign_anchor_classes_by_iou_with_bboxes,
    decode_bboxes,
    focal_loss_with_bbox,
    get_anchors,
    iou_nd,
    non_max_suppression,
)


@pytest.mark.parity
def test_anchors_match_reference(reference_models_path):
    import sys

    import _tfa_stub

    _tfa_stub.install()
    sys.path.insert(0, reference_models_path)
    try:
        from keras_cv_attention_models.coco import anchors_func
    finally:
        sys.path.remove(reference_models_path)

    ref = anchors_func.get_anchors((256, 256, 3), pyramid_levels=[3, 5]).numpy()
    ours = get_anchors((256, 256, 3), pyramid_levels=(3, 5))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    ref_af = anchors_func.get_anchor_free_anchors((128, 128, 3), [3, 4]).numpy()
    from vip_cup_2022_tpu.detect import get_anchor_free_anchors

    np.testing.assert_allclose(get_anchor_free_anchors((128, 128, 3), (3, 4)), ref_af, atol=1e-5)


def test_iou_and_coder_roundtrip():
    anchors = get_anchors((128, 128, 3), pyramid_levels=(3, 4))
    box = np.array([[0.2, 0.2, 0.6, 0.7]], np.float32)
    ious = np.asarray(iou_nd(box, anchors))
    assert ious.shape == (1, anchors.shape[0])
    assert 0 < ious.max() <= 1.0

    # encode a perfect prediction -> decode recovers the box
    a = anchors[np.argmax(ious[0])]
    a_ctr, a_hw = (a[:2] + a[2:]) / 2, a[2:] - a[:2]
    b_ctr, b_hw = (box[0, :2] + box[0, 2:]) / 2, box[0, 2:] - box[0, :2]
    enc = np.concatenate([(b_ctr - a_ctr) / a_hw, np.log(b_hw / a_hw), [0.9]])
    dec = np.asarray(decode_bboxes(enc[None], a[None]))
    np.testing.assert_allclose(dec[0, :4], box[0], atol=1e-5)


def test_assignment_marks():
    anchors = get_anchors((128, 128, 3), pyramid_levels=(3, 4))
    bbox_labels = np.array([[0.1, 0.1, 0.5, 0.5, 2.0]], np.float32)
    targets = assign_anchor_classes_by_iou_with_bboxes(bbox_labels, anchors, num_classes=3)
    marks = targets[:, -1]
    assert (marks == 1).sum() >= 1  # at least the best anchor is positive
    pos = targets[marks == 1]
    assert np.all(pos[:, 4 + 1] == 1.0)  # class 2 -> one-hot index 1


def test_focal_loss_finite_and_masked():
    rng = np.random.RandomState(0)
    a = 32
    y_true = np.zeros((2, a, 4 + 3 + 1), np.float32)
    y_true[:, :4, -1] = 1  # 4 positives
    y_true[:, :4, 4] = 1.0
    y_true[:, 10:12, -1] = -1  # ignored
    y_pred = rng.uniform(0.1, 0.9, size=(2, a, 4 + 3)).astype(np.float32)
    loss = float(focal_loss_with_bbox(y_true, y_pred))
    assert np.isfinite(loss) and loss > 0


def test_nms_hard_and_soft():
    boxes = np.array(
        [[0, 0, 1, 1], [0.05, 0.05, 1.05, 1.05], [2, 2, 3, 3]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, _ = non_max_suppression(boxes, scores, iou_threshold=0.5)
    assert list(idx) == [0, 2]  # near-duplicate suppressed
    idx_soft, sc_soft = non_max_suppression(boxes, scores, soft_nms_sigma=0.5, score_threshold=0.1)
    assert 0 in idx_soft and 2 in idx_soft


def test_decode_predictions_end_to_end():
    dp = DecodePredictions(input_shape=(128, 128), pyramid_levels=(3, 4))
    a = dp.anchors.shape[0]
    preds = np.full((a, 4 + 3), 0.01, np.float32)
    preds[10, :4] = 0.0  # perfect anchor match
    preds[10, 4 + 1] = 0.95
    boxes, labels, scores = dp(preds, score_threshold=0.5)
    assert len(boxes) == 1 and labels[0] == 1 and scores[0] > 0.9


@pytest.mark.parity
def test_parity_yolox(reference_models_path, tmp_path):
    import os
    import sys

    import jax.numpy as jnp
    import numpy as np

    import _tfa_stub

    _tfa_stub.install()
    if reference_models_path not in sys.path:
        sys.path.insert(0, reference_models_path)
    from keras_cv_attention_models.yolox.yolox import YOLOX as RefYOLOX

    from vip_cup_2022_tpu.models import create_model, transfer_weights
    from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5

    ref = RefYOLOX(
        depth_mul=0.33, width_mul=0.25, input_shape=(128, 128, 3),
        num_classes=5, pretrained=None, model_name="yolox_test",
    )
    h5 = os.path.join(tmp_path, "yolox.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 128, 128, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "YOLOXS", input_size=(128, 128), nb_classes=5, width_mul=0.25,
    )
    loaded = convert_keras_h5(h5, "yolox_s")
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    dst = flatten_dict(v["params"])
    missing = [k for k in dst if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"

    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_yolox_nano_depthwise(reference_models_path, tmp_path):
    import os
    import sys

    import jax.numpy as jnp
    import numpy as np

    import _tfa_stub

    _tfa_stub.install()
    if reference_models_path not in sys.path:
        sys.path.insert(0, reference_models_path)
    from keras_cv_attention_models.yolox.yolox import YOLOX as RefYOLOX

    from vip_cup_2022_tpu.models import create_model, transfer_weights
    from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5

    ref = RefYOLOX(
        depth_mul=0.33, width_mul=0.25, use_depthwise_conv=True,
        input_shape=(128, 128, 3), num_classes=5, pretrained=None,
        model_name="yolox_nano_test",
    )
    h5 = os.path.join(tmp_path, "yolox_nano.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 128, 128, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model("YOLOXNano", input_size=(128, 128), nb_classes=5)
    loaded = convert_keras_h5(h5, "yolox_nano")
    merged = transfer_weights(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_yolor(reference_models_path, tmp_path):
    import os
    import sys

    import jax.numpy as jnp
    import numpy as np

    import _tfa_stub

    _tfa_stub.install()
    if reference_models_path not in sys.path:
        sys.path.insert(0, reference_models_path)
    from keras_cv_attention_models.yolor.yolor import YOLOR as RefYOLOR

    from vip_cup_2022_tpu.models import create_model, transfer_weights
    from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5

    ref = RefYOLOR(
        csp_depthes=[1, 2, 2, 1], csp_channels=[32, 64, 128, 256],
        fpn_depth=1, ssp_depth=2, input_shape=(128, 128, 3),
        num_classes=5, pretrained=None, model_name="yolor_test",
    )
    h5 = os.path.join(tmp_path, "yolor.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(2, 128, 128, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "YOLOR_CSP", input_size=(128, 128), nb_classes=5,
        csp_depthes=(1, 2, 2, 1), csp_channels=(32, 64, 128, 256), fpn_depth=1,
    )
    loaded = convert_keras_h5(h5, "yolor_csp")
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    dst = flatten_dict(v["params"])
    missing = [k for k in dst if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"

    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    assert y.shape == y_ref.shape, (y.shape, y_ref.shape)
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_yolor_e6_flavor(reference_models_path, tmp_path):
    """Covers focus stem + csp downsample + no-shortcut-bn + 4-level fpn."""
    import os
    import sys

    import jax.numpy as jnp
    import numpy as np

    import _tfa_stub

    _tfa_stub.install()
    if reference_models_path not in sys.path:
        sys.path.insert(0, reference_models_path)
    from keras_cv_attention_models.yolor.yolor import YOLOR as RefYOLOR

    from vip_cup_2022_tpu.models import create_model, transfer_weights
    from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5

    ref = RefYOLOR(
        csp_depthes=[1, 1, 1, 1, 1], csp_channels=[16, 32, 64, 96, 128],
        features_pick=[-4, -3, -2, -1], fpn_depth=1, ssp_depth=2,
        use_focus_stem=True, csp_use_post=False, use_csp_downsample=True,
        use_shortcut_bn=False, input_shape=(256, 256, 3),
        num_classes=5, pretrained=None, model_name="yolor_e6_test",
    )
    h5 = os.path.join(tmp_path, "yolor_e6.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(1, 256, 256, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "YOLOR_E6", input_size=(256, 256), nb_classes=5,
        csp_depthes=(1, 1, 1, 1, 1), csp_channels=(16, 32, 64, 96, 128),
        fpn_depth=1,
    )
    loaded = convert_keras_h5(h5, "yolor_e6")
    merged = transfer_weights(loaded, v)
    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    assert y.shape == y_ref.shape, (y.shape, y_ref.shape)
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_parity_efficientdet_d0(reference_models_path, tmp_path):
    import os
    import sys

    import jax.numpy as jnp
    import numpy as np

    import _tfa_stub

    _tfa_stub.install()
    if reference_models_path not in sys.path:
        sys.path.insert(0, reference_models_path)
    from keras_cv_attention_models.efficientdet.efficientdet import EfficientDetD0

    from vip_cup_2022_tpu.models import create_model, transfer_weights
    from vip_cup_2022_tpu.weights.keras_h5 import convert_keras_h5

    ref = EfficientDetD0(input_shape=(128, 128, 3), num_classes=12, pretrained=None)
    h5 = os.path.join(tmp_path, "effdet.h5")
    ref.save_weights(h5)
    x = np.random.uniform(0, 1, size=(1, 128, 128, 3)).astype(np.float32)
    y_ref = ref(x, training=False).numpy()

    m, v, _ = create_model(
        "EfficientDetD0", input_size=(128, 128), nb_classes=12, mean=None, std=None,
    )
    loaded = convert_keras_h5(h5, "efficientdet_d0")
    merged = transfer_weights(loaded, v)

    from flax.traverse_util import flatten_dict

    src = set(flatten_dict(loaded["params"]))
    dst = flatten_dict(v["params"])
    missing = [k for k in dst if k not in src]
    assert not missing, f"unmatched params: {missing[:10]}"

    y = np.asarray(m.apply(merged, jnp.asarray(x)))
    assert y.shape == y_ref.shape, (y.shape, y_ref.shape)
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)
