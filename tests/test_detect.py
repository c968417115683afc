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


@pytest.mark.parity
def test_yolor_anchors_and_assign_match_reference(reference_models_path):
    import sys

    import _tfa_stub

    _tfa_stub.install()
    if reference_models_path not in sys.path:
        sys.path.insert(0, reference_models_path)
    import tensorflow as tf

    from keras_cv_attention_models.coco import anchors_func as ref_af

    from vip_cup_2022_tpu.detect import get_yolor_anchors, yolor_assign_anchors

    ours = get_yolor_anchors((256, 256), (3, 5))
    refs = ref_af.get_yolor_anchors((256, 256), [3, 5]).numpy()
    np.testing.assert_allclose(ours, refs, atol=1e-6)

    # training-mode ratios + assignment
    rng = np.random.RandomState(3)
    bboxes = np.sort(rng.uniform(0.05, 0.95, (6, 2, 2)), axis=1).reshape(6, 4).astype(np.float32)
    labels = rng.randint(1, 5, 6).astype(np.float32)
    bbox_labels = np.concatenate([bboxes, labels[:, None]], -1)

    ar_ref, fs_ref = ref_af.get_yolor_anchors((256, 256), [3, 5], is_for_training=True)
    assigned_ref = ref_af.yolor_assign_anchors(tf.constant(bbox_labels), ar_ref, fs_ref).numpy()

    ar, fs = get_yolor_anchors((256, 256), (3, 5), is_for_training=True)
    assigned = yolor_assign_anchors(bbox_labels, ar, fs)
    np.testing.assert_allclose(assigned, assigned_ref, atol=1e-5)


@pytest.mark.parity
def test_anchor_free_assign_and_loss_match_reference(reference_models_path):
    import sys

    import _tfa_stub

    _tfa_stub.install()
    if reference_models_path not in sys.path:
        sys.path.insert(0, reference_models_path)
    import jax
    import tensorflow as tf

    from keras_cv_attention_models.coco import anchors_func as ref_af
    from keras_cv_attention_models.coco import losses as ref_losses

    from vip_cup_2022_tpu.detect import AnchorFreeAssignMatching
    from vip_cup_2022_tpu.detect.losses import anchor_free_loss

    num_classes, input_shape = 6, (128, 128)
    rng = np.random.RandomState(5)
    nb = 8
    corners = np.sort(rng.uniform(0, 1, (nb, 2, 2)), axis=1).reshape(nb, 4)
    onehot = np.eye(num_classes)[rng.randint(0, num_classes, nb)]
    valid = (rng.uniform(size=(nb, 1)) > 0.3).astype(np.float64)
    bbox_labels_true = np.concatenate([corners, onehot, valid], -1).astype(np.float32)

    ours_assign = AnchorFreeAssignMatching(input_shape, (3, 5))
    num_anchors = ours_assign.anchors.shape[0]
    pred = rng.uniform(0.01, 0.99, (num_anchors, 4 + num_classes + 1)).astype(np.float32)
    pred[:, :4] = rng.uniform(-1, 1, (num_anchors, 4))

    # reference assignment (ragged output) -> dense reconstruction
    ref_assign = ref_af.AnchorFreeAssignMatching(input_shape, [3, 5])
    out_ref = ref_assign(tf.constant(bbox_labels_true), tf.constant(pred)).numpy()
    rb_true, rb_enc, rl_true, r_idx = out_ref[:, :4], out_ref[:, 4:8], out_ref[:, 8:-1], out_ref[:, -1].astype(int)
    dense_obj = np.zeros(num_anchors)
    dense_obj[r_idx] = 1.0
    dense_bb = np.zeros((num_anchors, 4)); dense_bb[r_idx] = rb_true
    dense_lb = np.zeros((num_anchors, num_classes)); dense_lb[r_idx] = rl_true
    dense_enc = np.zeros((num_anchors, 4)); dense_enc[r_idx] = rb_enc

    ours = jax.jit(ours_assign)(bbox_labels_true, pred)
    np.testing.assert_allclose(np.asarray(ours["object_true"]), dense_obj, atol=1e-6)
    obj = dense_obj.astype(bool)
    np.testing.assert_allclose(np.asarray(ours["bboxes_true"])[obj], dense_bb[obj], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["labels_true"])[obj], dense_lb[obj], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["bboxes_true_encoded"])[obj], dense_enc[obj], atol=1e-4)

    # full loss value
    ref_loss = ref_losses.AnchorFreeLoss(input_shape, [3, 5], use_l1_loss=True)
    ref_val = float(ref_loss(tf.constant(bbox_labels_true[None]), tf.constant(pred[None])))
    our_val = float(anchor_free_loss(bbox_labels_true[None], pred[None], ours_assign,
                                     use_l1_loss=True))
    np.testing.assert_allclose(our_val, ref_val, rtol=1e-4)


@pytest.mark.parity
def test_yolor_loss_matches_reference(reference_models_path):
    import sys

    import _tfa_stub

    _tfa_stub.install()
    if reference_models_path not in sys.path:
        sys.path.insert(0, reference_models_path)
    import tensorflow as tf

    from keras_cv_attention_models.coco import anchors_func as ref_af
    from keras_cv_attention_models.coco import losses as ref_losses

    from vip_cup_2022_tpu.detect import YolorLossWithBbox, get_yolor_anchors, yolor_assign_anchors

    num_classes, input_shape = 6, (256, 256)
    rng = np.random.RandomState(7)
    nb = 5
    corners = np.sort(rng.uniform(0.1, 0.9, (nb, 2, 2)), axis=1).reshape(nb, 4)
    onehot = np.eye(num_classes)[rng.randint(0, num_classes, nb)]
    bbox_labels = np.concatenate([corners, onehot, np.ones((nb, 1))], -1).astype(np.float32)

    ar, fs = get_yolor_anchors(input_shape, (3, 5), is_for_training=True)
    y_true = yolor_assign_anchors(bbox_labels, ar, fs)[None]
    y_pred = rng.uniform(0.01, 0.99, y_true.shape).astype(np.float32)

    ref_loss = ref_losses.YOLORLossWithBbox(input_shape, [3, 5])
    ref_val = float(ref_loss(tf.constant(y_true), tf.constant(y_pred)))
    our = YolorLossWithBbox(input_shape, (3, 5))
    our_val = float(our(y_true, y_pred))
    np.testing.assert_allclose(our_val, ref_val, rtol=1e-4)


def test_mosaic_and_loader():
    from vip_cup_2022_tpu.detect import DetectionLoader, mosaic_mix_batch

    rng = np.random.RandomState(0)
    imgs = rng.rand(8, 64, 64, 3).astype(np.float32)
    bboxes = np.sort(rng.uniform(0, 1, (8, 3, 2, 2)), axis=2).reshape(8, 3, 4).astype(np.float32)
    labels = rng.randint(1, 5, (8, 3))
    mixed, (mb, ml) = mosaic_mix_batch(imgs, bboxes, labels, rng=rng)
    assert mixed.shape == imgs.shape
    assert mb.shape == (8, 12, 4) and ml.shape == (8, 12)
    assert (mb >= 0).all() and (mb <= 1).all()
    valid = ml > 0
    assert ((mb[valid][:, 2:] - mb[valid][:, :2]) > 0).all()

    # loader end-to-end: variable-size images -> fixed padded targets
    images = [rng.randint(0, 255, (rng.randint(60, 120), rng.randint(60, 120), 3), dtype=np.uint8) for _ in range(8)]
    bbs = [np.sort(rng.uniform(0, 1, (2, 2, 2)), axis=1).reshape(2, 4) for _ in range(8)]
    lbs = [rng.randint(1, 5, 2) for _ in range(8)]
    loader = DetectionLoader(images, bbs, lbs, num_classes=4, batch_size=4, target_shape=(96, 96))
    batches = list(loader)
    assert len(batches) == 2
    x, y = batches[0]
    assert x.shape == (4, 96, 96, 3) and y.shape == (4, 100, 4 + 4 + 1)
    assert np.isfinite(x).all() and 0 <= x.min() and x.max() <= 1


def test_coco_map_sanity():
    from vip_cup_2022_tpu.detect import coco_map

    rng = np.random.RandomState(1)
    gts, perfect, shifted, empty = [], [], [], []
    for _ in range(6):
        boxes = np.sort(rng.uniform(0, 1, (4, 2, 2)), axis=1).reshape(4, 4)
        labels = rng.randint(0, 3, 4)
        gts.append((boxes, labels))
        perfect.append((boxes, np.ones(4), labels))
        shifted.append((boxes + 0.08, np.ones(4), labels))
        empty.append((np.zeros((0, 4)), np.zeros(0), np.zeros(0, int)))
    m_perfect = coco_map(perfect, gts, 3)
    m_shifted = coco_map(shifted, gts, 3)
    m_empty = coco_map(empty, gts, 3)
    assert m_perfect["AP"] > 0.99, m_perfect
    assert m_empty["AP"] == 0.0
    assert m_shifted["AP"] < m_perfect["AP"]
    assert m_shifted["AP50"] >= m_shifted["AP"]


@pytest.mark.slow
def test_yolox_custom_backbone():
    import jax.numpy as jnp

    from vip_cup_2022_tpu.models import create_model

    m, v, _ = create_model(
        "YOLOXS", input_size=(128, 128), nb_classes=4, width_mul=-1.0, depth_mul=0.33,
        backbone_name="EfficientNetV1B0",
        backbone_feature_names=(
            "stack_2_block1_output", "stack_4_block2_output", "stack_6_block0_output",
        ),
    )
    x = jnp.ones((1, 128, 128, 3), jnp.float32)
    out = m.apply(v, x)
    assert out.shape == (1, 336, 4 + 4 + 1)
    feats = m.apply(v, x, features_only=True)
    assert [f.shape[-1] for f in feats] == [40, 112, 320]


def test_coco_map_golden_interpolation_and_ties():
    """Hand-derived pycocotools-protocol fixtures (VERDICT r2 item 6).

    Interpolation boundary: 2 gts, 1 exact TP (score .9) + 1 disjoint FP
    (score .8): recall=[.5,.5], precision envelope=[1,.5]; the 101-point
    sum takes precision 1.0 at the 51 recall points <= 0.5 and 0 above
    => AP = 51/101 at every IoU threshold."""
    from vip_cup_2022_tpu.detect import coco_map

    gt = (np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float), np.zeros(2, int))
    det = (
        np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float),
        np.array([0.9, 0.8]),
        np.zeros(2, int),
    )
    m = coco_map([det], [gt], 1)
    assert np.isclose(m["AP"], 51 / 101)
    assert np.isclose(m["AP50"], 51 / 101)
    # AR: recall tops out at 0.5 at every threshold
    assert np.isclose(m["AR"], 0.5)

    # score tie: equal scores keep insertion order (stable mergesort, the
    # pycocotools behavior). FP-before-TP: precision envelope [.5,.5]
    # => AP = 51*0.5/101; TP-before-FP: [1,.5] => AP = 51/101.
    det_fp_first = (
        np.array([[50, 50, 60, 60], [0, 0, 10, 10]], float),
        np.array([0.5, 0.5]),
        np.zeros(2, int),
    )
    det_tp_first = (
        np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float),
        np.array([0.5, 0.5]),
        np.zeros(2, int),
    )
    m_fp = coco_map([det_fp_first], [gt], 1)
    m_tp = coco_map([det_tp_first], [gt], 1)
    assert np.isclose(m_fp["AP"], 51 * 0.5 / 101)
    assert np.isclose(m_tp["AP"], 51 / 101)


def test_coco_map_golden_maxdets():
    """maxDets truncation: 100 high-score FPs bury the single TP (score .1).
    At maxDets=100 the TP is cut => AP=0; at 101 every one of the 101 recall
    points interpolates to precision 1/101 => AP = 1/101."""
    from vip_cup_2022_tpu.detect import coco_map

    gt = (np.array([[0, 0, 10, 10]], float), np.zeros(1, int))
    fp_boxes = np.stack(
        [[100 + 20 * i, 100, 110 + 20 * i, 110] for i in range(100)]
    ).astype(float)
    boxes = np.concatenate([fp_boxes, np.array([[0, 0, 10, 10]], float)])
    scores = np.concatenate([np.linspace(0.99, 0.90, 100), [0.1]])
    det = (boxes, scores, np.zeros(101, int))
    assert coco_map([det], [gt], 1, max_dets=100)["AP"] == 0.0
    assert np.isclose(coco_map([det], [gt], 1, max_dets=101)["AP"], 1 / 101)


def test_coco_map_golden_area_ranges():
    """Area buckets: a small (16x16=256 px^2 < 32^2) and a large
    (200x200 px^2 > 96^2) gt, each with an exact detection, plus one
    unmatched small-area FP (score .7).

    - AP_small: large gt ignored; the large det matches that ignored gt and
      is dropped (not a FP); the small FP counts. Detections after ignore
      filtering: [TP(.9), FP(.7)] -> recall hits 1.0 at the first det, so
      every recall point interpolates to precision[0]=1.0 => AP_small = 1.0.
    - AP_large: the small gt and small dets are out of range/ignored =>
      only the large TP counts => AP_large = 1.0.
    - AP(all): TP(.9), TP(.8), FP(.7): all 101 points interpolate to
      precision 1.0 => AP = 1.0 (the trailing FP never lowers the envelope
      at reached recalls).
    """
    from vip_cup_2022_tpu.detect import coco_map

    gt_boxes = np.array([[0, 0, 16, 16], [100, 100, 300, 300]], float)
    gt = (gt_boxes, np.zeros(2, int))
    det = (
        np.array([[0, 0, 16, 16], [100, 100, 300, 300], [400, 400, 416, 416]], float),
        np.array([0.9, 0.8, 0.7]),
        np.zeros(3, int),
    )
    m = coco_map([det], [gt], 1)
    assert np.isclose(m["AP"], 1.0)
    assert np.isclose(m["AP_small"], 1.0)
    assert np.isclose(m["AP_large"], 1.0)
    # medium: no gt in range anywhere -> excluded from the mean (NaN->0 via
    # the nanmean guard, reported as 0.0 only when EVERY class is empty)
    assert m["AP_medium"] == 0.0


def test_coco_map_golden_crowd():
    """iscrowd semantics: crowd gts are ignore regions with IoU computed
    against the detection's own area; crowds may absorb multiple detections;
    absorbed detections are neither TP nor FP.

    d1 (10x10, inside the 100x100 crowd, normal IoU would be 0.01) has
    crowd-IoU 1.0 -> matched-ignored; d3 likewise even though the crowd is
    already matched. Only d2 (exact match on the real gt) scores:
    AP = 1.0. Without crowd handling d1/d3 would be FPs and AP would drop
    to 51/101 (d1 outranks the TP)."""
    from vip_cup_2022_tpu.detect import coco_map

    gt = (
        np.array([[0, 0, 100, 100], [200, 200, 210, 210]], float),
        np.zeros(2, int),
        np.array([1, 0]),  # first gt is crowd
    )
    det = (
        np.array([[20, 20, 30, 30], [200, 200, 210, 210], [50, 50, 60, 60]], float),
        np.array([0.9, 0.8, 0.7]),
        np.zeros(3, int),
    )
    m = coco_map([det], [gt], 1)
    assert np.isclose(m["AP"], 1.0)
    assert np.isclose(m["AR"], 1.0)

    # same boxes WITHOUT the crowd flag: d1/d3 fail the 0.01-IoU match and
    # count as FPs; envelope = [0, 1/2, 1/2] ordered by score -> AP = 51*0.5/101
    gt_nc = (gt[0], gt[1])
    m_nc = coco_map([det], [gt_nc], 1)
    assert np.isclose(m_nc["AP"], 51 * 0.5 / 101)
