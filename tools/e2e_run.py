#!/usr/bin/env python3
"""End-to-end CSV->CSV product run on real hardware (VERDICT r3 item 4).

Proves the product contract at speed: generates a synthetic JPEG testset in
the competition's eval shape (200x200, JPEG-recompressed at varying quality —
reference README.md:69), runs ``python3 main.py input.csv output.csv``
exactly as the judge would (reference envelope: 5,000 images within 1 hour on
the organizers' box, README.md:104), and reports:

- wall time of the full CLI run (cold = includes jit compile; warm = cached)
- host decode-pool throughput measured standalone (can it feed the chip?)
- device-only throughput for context (from BENCH)
- p50 per-batch end-to-end latency (VIPTPU_E2E_BATCH_TIMES sync mode)

Writes one JSON line to stdout and (with --out) a sibling JSON file.

Usage:
  python tools/e2e_run.py --n 5000 --out E2E_r04.json
  python tools/e2e_run.py --n 200 --platform cpu     # quick local sanity
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_testset(root: str, n: int, seed: int = 0):
    """Synthetic 200x200 JPEGs with low-frequency structure + noise, saved at
    varying JPEG quality (the eval spec's recompression, README.md:69)."""
    import numpy as np
    from PIL import Image

    img_dir = os.path.join(root, "testset")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    names = []
    t0 = time.perf_counter()
    for i in range(n):
        base = rng.randint(0, 256, size=(25, 25, 3), dtype=np.uint8)
        img = np.kron(base, np.ones((8, 8, 1), np.uint8))
        noise = rng.randint(0, 32, size=(200, 200, 3), dtype=np.uint8)
        img = np.clip(img.astype(np.int16) + noise - 16, 0, 255).astype(np.uint8)
        name = f"img_{i:05d}.jpg"
        Image.fromarray(img).save(
            os.path.join(img_dir, name), quality=int(rng.randint(65, 100))
        )
        names.append(name)
    gen_s = time.perf_counter() - t0
    csv = os.path.join(img_dir, "input.csv")
    with open(csv, "w") as fh:
        fh.write("filename\n")
        fh.writelines(f"{x}\n" for x in names)
    return csv, gen_s


_MAKE_CKPTS_SRC = """
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from vip_cup_2022_tpu.infer.engine import registry_name
from vip_cup_2022_tpu.models import create_model
from vip_cup_2022_tpu.utils.checkpoint import save_variables
ckpt_root, manifest = {ckpt_root!r}, {manifest!r}
for base_dir, dim, _idx in json.load(open(manifest)):
    name = registry_name(base_dir)  # same dir->name rule as the engine
    d = os.path.join(ckpt_root, base_dir, "ckpt")
    os.makedirs(d, exist_ok=True)
    _, variables, _ = create_model(
        name, input_size=tuple(dim), nb_classes=1,
        classifier_activation="sigmoid")
    save_variables(os.path.join(d, "fold0.msgpack"), variables)
    json.dump({{"nb_classes": 1, "classifier_activation": "sigmoid"}},
              open(os.path.join(d, "config.json"), "w"))
"""


def make_ckpts(root: str) -> str:
    """Random-init fold checkpoints for all 7 members in the production
    layout (ckpts/<dir>/ckpt/fold0.msgpack + config.json + ckpts.json), so
    the timed CLI runs exercise the PRODUCTION load path — manifest ->
    msgpack load -> lazy shape-only init + transfer — instead of the
    random-init dev path whose 7x jit(module.init) dominated the r5 first
    e2e measurement (~3 min of the 6 min wall). Untimed (a real deployment
    ships trained checkpoints).

    Runs in a CPU-pinned SUBPROCESS: initializing jax in this parent
    process would claim the accelerator before the timed CLI subprocesses
    launch (on a directly-attached TPU host the child would then fail
    device init or silently fall back to CPU)."""
    ckpt_root = os.path.join(root, "ckpts")
    manifest = os.path.join(REPO, "ckpts", "ckpts.json")
    os.makedirs(ckpt_root, exist_ok=True)
    shutil.copy(manifest, os.path.join(ckpt_root, "ckpts.json"))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # site hook force-registers TPU
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, "-c", _MAKE_CKPTS_SRC.format(
            repo=REPO, ckpt_root=ckpt_root, manifest=manifest)],
        env=env, check=True,
    )
    print(f"[e2e] 7 member ckpts generated in "
          f"{time.perf_counter() - t0:.0f}s (untimed, cpu subprocess)",
          file=sys.stderr, flush=True)
    return ckpt_root


def time_decode_pool(csv_path: str, threads: int = 16) -> dict:
    """Standalone host decode+resize throughput of the engine's cv2 pool
    (data/decode.py + the NATIVE_SIZE resize) — the producer side of the
    streaming path."""
    sys.path.insert(0, REPO)
    import pandas as pd

    from vip_cup_2022_tpu.data.decode import ImageDecoder
    from vip_cup_2022_tpu.data.pipeline import _host_resize_uint8

    df = pd.read_csv(csv_path)
    paths = [os.path.join(os.path.dirname(csv_path), f) for f in df.filename]
    dec = ImageDecoder(num_threads=threads)
    post = lambda im: _host_resize_uint8(im, (200, 200))  # noqa: E731
    # warm the pool
    [f.result() for f in dec.submit_batch(paths[:32], post)]
    t0 = time.perf_counter()
    futs = dec.submit_batch(paths, post)
    out = [f.result() for f in futs]
    dt = time.perf_counter() - t0
    assert len(out) == len(paths) and out[0].shape == (200, 200, 3)
    return {"n": len(paths), "threads": threads, "seconds": round(dt, 2),
            "img_per_sec": round(len(paths) / dt, 1)}


def run_cli(csv_path: str, out_csv: str, env_extra=None, timeout=5400) -> dict:
    env = dict(os.environ)
    env["VIPTPU_ALLOW_RANDOM_INIT"] = "1"  # no released weights in-env
    env["VIPTPU_VERBOSE"] = "1"
    env.update(env_extra or {})
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), csv_path, out_csv],
        env=env, capture_output=True, text=True, timeout=timeout, cwd=REPO,
    )
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        print(proc.stdout[-4000:], file=sys.stderr)
        print(proc.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"main.py failed rc={proc.returncode}")
    infer_min = None
    for line in proc.stdout.splitlines():
        if "TIME TO INFER" in line:
            infer_min = float(line.split(":")[-1].replace("min", "").strip())
    n_rows = sum(1 for _ in open(out_csv)) - 1
    return {"wall_s": round(wall, 1), "infer_min_reported": infer_min,
            "rows_out": n_rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--platform", default="",
                    help="set VIPTPU_PLATFORM for the CLI run (e.g. cpu)")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip-latency", action="store_true",
                    help="skip the synchronous per-batch latency rerun")
    ap.add_argument("--no-ckpts", action="store_true",
                    help="skip checkpoint pre-generation and run the CLI in "
                         "random-init dev mode (the pre-r5 behavior)")
    args = ap.parse_args()

    root = args.workdir or tempfile.mkdtemp(prefix="vip_e2e_")
    os.makedirs(root, exist_ok=True)
    csv_path, gen_s = make_testset(root, args.n)
    print(f"[e2e] {args.n} JPEGs generated in {gen_s:.1f}s -> {root}",
          file=sys.stderr, flush=True)

    decode = time_decode_pool(csv_path)
    print(f"[e2e] decode pool: {decode['img_per_sec']} img/s", file=sys.stderr,
          flush=True)

    env_extra = {}
    if args.platform:
        env_extra["VIPTPU_PLATFORM"] = args.platform
    if not args.no_ckpts:
        env_extra["VIPTPU_CKPT_DIR"] = make_ckpts(root)

    out_csv = os.path.join(root, "output.csv")
    cold = run_cli(csv_path, out_csv, env_extra)
    print(f"[e2e] cold run: {cold}", file=sys.stderr, flush=True)
    warm = run_cli(csv_path, out_csv, env_extra)
    print(f"[e2e] warm run: {warm}", file=sys.stderr, flush=True)

    lat = None
    if not args.skip_latency:
        times_json = os.path.join(root, "batch_times.json")
        sync = run_cli(csv_path, out_csv,
                       {**env_extra, "VIPTPU_E2E_BATCH_TIMES": times_json})
        with open(times_json) as fh:
            bt = json.load(fh)
        ts = sorted(bt["batch_e2e_s"])
        lat = {
            "batch_size": bt["batch_size"],
            "n_batches": len(ts),
            "p50_ms": round(ts[len(ts) // 2] * 1e3, 1),
            "p90_ms": round(ts[int(len(ts) * 0.9)] * 1e3, 1),
            "max_ms": round(ts[-1] * 1e3, 1),
            "sync_run_wall_s": sync["wall_s"],
        }
        print(f"[e2e] per-batch latency: {lat}", file=sys.stderr, flush=True)

    result = {
        "metric": "e2e_csv_to_csv",
        "ckpt_mode": ("random-init dev" if args.no_ckpts else
                      "production load path (pre-generated fold ckpts)"),
        "n_images": args.n,
        "decode_pool": decode,
        "cold": cold,
        "warm": warm,
        "e2e_img_per_sec_warm": round(args.n / warm["wall_s"], 1),
        "e2e_img_per_sec_cold": round(args.n / cold["wall_s"], 1),
        "batch_latency": lat,
        "envelope": "reference: 5000 imgs / 1 h incl. model load (README.md:104)",
        "within_envelope": cold["wall_s"] < 3600,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
    if not args.keep and not args.workdir:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
