"""Checkpoint-format handling: SavedModel reader (reference main.py:106-107),
transfer_weights mismatch reporting, engine decode-cache keying, and the
evaluate_csv binarization flag — round-1 VERDICT/ADVICE items."""
import os

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from vip_cup_2022_tpu.models.factory import transfer_weights


# ---------------------------------------------------------------------------
# transfer_weights mismatch reporting
# ---------------------------------------------------------------------------
def test_transfer_weights_warns_on_missing_param():
    src = {"params": {"conv": {"kernel": np.ones((3, 3, 3, 8), np.float32)}}}
    dst = {
        "params": {
            "conv": {"kernel": jnp.zeros((3, 3, 3, 8))},
            "extra": {"kernel": jnp.zeros((8, 8))},
        }
    }
    with pytest.warns(UserWarning, match="missing from source"):
        out = transfer_weights(src, dst)
    np.testing.assert_allclose(np.asarray(out["params"]["conv"]["kernel"]), 1.0)


def test_transfer_weights_raise_mode():
    src = {"params": {"conv": {"kernel": np.ones((3, 3, 3, 8), np.float32)}}}
    dst = {"params": {"conv": {"kernel": jnp.zeros((5, 5, 3, 8))}}}  # bad shape
    with pytest.raises(ValueError, match="shape-mismatched"):
        transfer_weights(src, dst, on_mismatch="raise")
    # silent mode keeps init without complaint
    out = transfer_weights(src, dst, on_mismatch="silent")
    np.testing.assert_allclose(np.asarray(out["params"]["conv"]["kernel"]), 0.0)


def test_transfer_weights_classifier_swap_not_reported():
    """Shape mismatch on the classifier head is the intended swap
    (tfimm factory.py:196-221) — no warning, clean copy of the rest."""
    import warnings

    src = {
        "params": {
            "conv": {"kernel": np.ones((3, 3, 3, 8), np.float32)},
            "predictions": {"kernel": np.ones((8, 1000), np.float32)},
        }
    }
    dst = {
        "params": {
            "conv": {"kernel": jnp.zeros((3, 3, 3, 8))},
            "predictions": {"kernel": jnp.zeros((8, 2))},
        }
    }
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = transfer_weights(src, dst)
    assert out["params"]["predictions"]["kernel"].shape == (8, 2)


# ---------------------------------------------------------------------------
# SavedModel reader
# ---------------------------------------------------------------------------
def test_read_savedmodel_matches_h5(tmp_path):
    """A Keras model saved both ways yields the same flat weight dict, so the
    h5 family mappers apply unchanged to SavedModel checkpoints."""
    tf = pytest.importorskip("tensorflow")
    from vip_cup_2022_tpu.weights.keras_h5 import _dedupe_layer_prefix, read_keras_h5
    from vip_cup_2022_tpu.weights.savedmodel import read_savedmodel, savedmodel_dir

    keras = tf.keras
    model = keras.Sequential(
        [
            keras.layers.Input((16, 16, 3)),
            keras.layers.Conv2D(4, 3, name="stem_conv"),
            keras.layers.BatchNormalization(name="stem_bn"),
            keras.layers.GlobalAveragePooling2D(),
            keras.layers.Dense(2, name="predictions"),
        ],
        name="tiny",
    )
    h5_path = tmp_path / "m.h5"
    sm_dir = tmp_path / "sm"
    model.save(str(h5_path))
    model.save(str(sm_dir), save_format="tf")

    h5 = {_dedupe_layer_prefix(k): v for k, v in read_keras_h5(str(h5_path)).items()}
    sm = {_dedupe_layer_prefix(k): v for k, v in read_savedmodel(str(sm_dir)).items()}
    assert set(h5) == set(sm), (sorted(h5), sorted(sm))
    for k in h5:
        np.testing.assert_allclose(h5[k], sm[k], atol=0)

    # manifest-resolved path (the saved_model.pb file itself) normalizes
    assert savedmodel_dir(os.path.join(str(sm_dir), "saved_model.pb")) == str(sm_dir)
    assert savedmodel_dir(str(sm_dir)) == str(sm_dir)
    assert savedmodel_dir(str(tmp_path)) == ""


# ---------------------------------------------------------------------------
# decode cache keyed on the path list
# ---------------------------------------------------------------------------
def test_engine_decode_cache_keyed_on_paths(tmp_path):
    from PIL import Image

    from vip_cup_2022_tpu.infer.engine import EnsembleEngine

    rng = np.random.RandomState(0)
    paths = []
    for i in range(2):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(rng.randint(0, 255, (200, 200, 3), np.uint8)).save(p)
        paths.append(str(p))

    eng = EnsembleEngine(verbose=0)
    first = eng._decode_all([paths[0]])
    second = eng._decode_all([paths[1]])  # different CSV -> must re-decode
    assert not np.array_equal(first[0], second[0])
    # same key -> cache hit (identical object back)
    assert eng._decode_all([paths[1]])[0] is second[0]


# ---------------------------------------------------------------------------
# evaluate_csv explicit binarization
# ---------------------------------------------------------------------------
def test_evaluate_csv_pred_format(tmp_path):
    from vip_cup_2022_tpu.eval.harness import evaluate_csv

    truth = tmp_path / "in.csv"
    preds = tmp_path / "out.csv"
    pd.DataFrame({"filename": ["a", "b"], "label": [1, 0]}).to_csv(truth, index=False)
    # raw probabilities that happen to take only 2 distinct values — the
    # ambiguous case the auto heuristic mis-reads
    pd.DataFrame({"filename": ["a", "b"], "logit": [0.9, 0.9]}).to_csv(preds, index=False)

    raw = evaluate_csv(str(truth), pred_csv=str(preds), pred_format="raw")
    assert raw["balanced_accuracy"] == pytest.approx(0.5)  # both -> 1
    binary = evaluate_csv(str(truth), pred_csv=str(preds), pred_format="binary")
    assert binary["n"] == 2
    with pytest.raises(ValueError):
        evaluate_csv(str(truth), pred_csv=str(preds), pred_format="bogus")
