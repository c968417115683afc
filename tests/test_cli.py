"""End-to-end CSV contract test (SURVEY.md §7 config 1): the
``python3 main.py input.csv output.csv`` pipeline over real JPEG files with a
one-model manifest, producing the binarized filename,logit CSV."""
import json
import os
import sys

import numpy as np
import pandas as pd
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(7)
    names = []
    for i in range(10):
        arr = rng.randint(0, 255, size=(200, 200, 3), dtype=np.uint8)
        name = f"img_{i:03d}.jpg"
        Image.fromarray(arr).save(img_dir / name, quality=92)
        names.append(name)
    # one odd-sized image to exercise host unification
    arr = rng.randint(0, 255, size=(256, 144, 3), dtype=np.uint8)
    Image.fromarray(arr).save(img_dir / "odd.jpg", quality=92)
    names.append("odd.jpg")

    input_csv = img_dir / "input.csv"
    pd.DataFrame({"filename": names}).to_csv(input_csv, index=False)

    # build a ckpts tree with a random-init ResNetRS50 checkpoint
    from vip_cup_2022_tpu.models import create_model
    from vip_cup_2022_tpu.utils.checkpoint import save_variables

    ckpt_dir = root / "ckpts" / "ResNetRS50-200x200" / "ckpt"
    ckpt_dir.mkdir(parents=True)
    _, variables, _ = create_model(
        "ResNetRS50", input_size=(200, 200), nb_classes=1, classifier_activation="sigmoid"
    )
    save_variables(str(ckpt_dir / "fold0.msgpack"), variables)
    with open(ckpt_dir / "config.json", "w") as fh:
        json.dump({"nb_classes": 1, "classifier_activation": "sigmoid"}, fh)
    manifest = [["ResNetRS50-200x200", [200, 200], 0]]
    with open(root / "ckpts" / "ckpts.json", "w") as fh:
        json.dump(manifest, fh)
    return root, input_csv, names


def test_main_cli_contract(workspace, monkeypatch):
    root, input_csv, names = workspace
    output_csv = root / "output.csv"

    monkeypatch.setenv("VIPTPU_MAX_BATCH", "8")
    monkeypatch.setenv("VIPTPU_VERBOSE", "0")

    import main as cli

    monkeypatch.setattr(cli, "CWD", str(root))
    cli.main(["main.py", str(input_csv), str(output_csv)])

    out = pd.read_csv(output_csv)
    assert list(out.columns) == ["filename", "logit"]
    assert len(out) == len(names)
    assert set(out.filename) == set(names)
    assert set(np.unique(out.logit)).issubset({0.0, 1.0})
    # groupby sorts filenames (reference main.py:143 semantics)
    assert list(out.filename) == sorted(names)


def test_predictions_deterministic(workspace, monkeypatch):
    """Same inputs -> identical outputs across runs (seeded, TTA off)."""
    root, input_csv, names = workspace
    monkeypatch.setenv("VIPTPU_MAX_BATCH", "8")
    monkeypatch.setenv("VIPTPU_VERBOSE", "0")
    import main as cli

    monkeypatch.setattr(cli, "CWD", str(root))
    out1, out2 = root / "o1.csv", root / "o2.csv"
    cli.main(["main.py", str(input_csv), str(out1)])
    cli.main(["main.py", str(input_csv), str(out2)])
    pd.testing.assert_frame_equal(pd.read_csv(out1), pd.read_csv(out2))
