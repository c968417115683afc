#!/usr/bin/env python3
"""CSV-in / CSV-out synthetic-image detection CLI.

Contract parity with reference main.py (awsaf49/vip-cup-2022):

    python3 main.py <input.csv> <output.csv>

- input CSV has a ``filename`` column; image files live next to the input CSV
  (main.py:164, :77-79)
- checkpoints resolved from ``<script_dir>/ckpts/ckpts.json`` (main.py:158-159)
- output CSV: columns ``filename,logit`` with logit binarized at
  ``ensemble mean > 0.487`` (main.py:144-145, :225)
- defaults: tta=1, debug=0, agg='mean', bicubic resize, seed 42
  (main.py:161-167, :221-225)

TPU-native execution: one decode pass shared by the whole ensemble, jitted
XLA forwards with batches sharded over the device mesh (see
vip_cup_2022_tpu/infer/engine.py).
"""
import os
import sys
import time

# resolve script dir the same way the reference does (main.py:2-11)
_paths = sys.argv[0].rsplit("/", 1)
CWD = _paths[0] if len(_paths) > 1 else "."


def main(argv):
    input_csv_path = argv[1]
    output_csv_path = argv[2]

    platform = os.environ.get("VIPTPU_PLATFORM", "")
    if platform:  # the axon plugin ignores JAX_PLATFORMS; use the config knob
        import jax

        jax.config.update("jax_platforms", platform)

    # persistent executable cache: the fused 7-member program costs minutes
    # to compile; repeat CLI invocations reuse it (VIPTPU_NO_JIT_CACHE=1 off)
    if not int(os.environ.get("VIPTPU_NO_JIT_CACHE", "0")):
        import jax

        cache_dir = os.environ.get(
            "VIPTPU_JIT_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "vip_cup_2022_tpu_jit"),
        )
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:
            pass  # older jax without the knobs

    from vip_cup_2022_tpu.core.config import Config
    from vip_cup_2022_tpu.data.pipeline import seeding
    from vip_cup_2022_tpu.infer.engine import EnsembleEngine, load_manifest
    from vip_cup_2022_tpu.parallel.mesh import get_mesh, num_replicas

    model_dir = os.environ.get("VIPTPU_CKPT_DIR", os.path.join(CWD, "ckpts"))
    manifest_path = os.environ.get("VIPTPU_CKPTS_JSON", os.path.join(model_dir, "ckpts.json"))

    debug = int(os.environ.get("VIPTPU_DEBUG", "0"))
    verbose = int(os.environ.get("VIPTPU_VERBOSE", "1"))
    tta = int(os.environ.get("VIPTPU_TTA", "1"))
    allow_missing = bool(int(os.environ.get("VIPTPU_ALLOW_RANDOM_INIT", "0")))

    CFG = Config({})
    CFG.test_csv = input_csv_path
    CFG.output_csv_path = output_csv_path
    CFG.verbose = verbose
    CFG.model_dir = model_dir
    CFG.infer_path = os.path.dirname(input_csv_path)
    CFG.debug = debug
    CFG.tta = tta
    CFG.agg = "mean"
    CFG.resize_method = "bicubic"
    CFG.num_classes = 1
    CFG.seed = 42
    CFG.thr = 0.487

    CFG.ckpt_cfg = load_manifest(model_dir, manifest_path, allow_missing=allow_missing)
    if verbose:
        print("\n> CHECKPOINTS: ")
        for entry in CFG.ckpt_cfg:
            print(list(entry))
        print("> DEBUG MODE:", bool(CFG.debug))

    mesh = get_mesh()
    CFG.replicas = num_replicas(mesh)
    if verbose:
        print(f"> REPLICAS: {CFG.replicas}")

    seeding(CFG)

    engine = EnsembleEngine(mesh=mesh, verbose=verbose)
    start = time.time()
    if int(os.environ.get("VIPTPU_FUSED", "1")):
        # DEFAULT: whole ensemble (all members x folds x TTA) as one jitted
        # program per batch — one dispatch instead of per member x fold, all
        # aggregation on device (equivalence tested in tests/test_cli.py)
        engine.predict_soln_fused(CFG)
    else:
        # reference-shaped sequential path (per-member/fold predict loops)
        engine.predict_soln(CFG, ensemble=True)
    eta = (time.time() - start) / 60
    print(f"\n> TIME TO INFER: {eta:0.2f} min")


if __name__ == "__main__":
    main(sys.argv)
