"""CSV-in / CSV-out ensemble inference engine.

This is the TPU-native rebuild of ``predict_soln`` + the ``__main__`` driver
(reference main.py:58-235). Contract surface preserved exactly:

- ckpts.json manifest of ``[base_dir, [H, W], idx]`` entries, checkpoint files
  resolved under ``<model_dir>/<base_dir>/ckpt/`` (main.py:186-197)
- per-model batch size ``8 * NAME2BS.get(name, 16)`` (main.py:43-56, :85)
- TTA disabled at tta=1; with tta>1 the augment of dataset/augment.py applies
- multiclass -> binary via ``1 - p[:, 0]`` (main.py:113-114)
- ``agg`` (mean) over TTA then folds then models (main.py:111, :121, :142-143)
- ensemble binarized at ``logit > thr (0.487)``, CSV columns filename,logit
  (main.py:144-145)
- debug mode truncates to 100 paths (main.py:83-84)

TPU-native differences (SURVEY.md §7 throughput notes):
- images are decoded ONCE and shared across all ensemble members (the
  reference rebuilds the tf.data pipeline per model)
- everything after the uint8 H2D copy — cast, resize-to-model-dim (two MXU
  matmuls), TTA augment, normalize, forward — is one jitted XLA program
- batches are sharded over the mesh 'data' axis; fold/TTA reductions happen
  on device
"""
from __future__ import annotations

import json
import os
import time
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data.augment import apply_augment
from ..data.decode import ImageDecoder
from ..data.pipeline import _host_resize_uint8
from ..models import create_model
from ..models.factory import load_weights, transfer_weights
from ..ops.resize import resize
from ..parallel.mesh import batch_sharding, get_mesh, num_replicas, pad_to_multiple

# Per-model batch-size table (reference main.py:43-56). Effective batch is
# 8 * NAME2BS.get(name, 16).
NAME2BS: Dict[str, int] = {
    "convnext_large_384_in22ft1k-200x200": 16,
    "convnext_large_in22ft1k-200x200": 16,
    "convnext_base_384_in22ft1k-200x200": 32,
    "HorNetBase-200x200": 32,
    "EfficientNetV2M-200x200": 64,
    "convnext_base_in22k-200x200": 32,
    "ECA_NFNetL2-200x200": 32,
    "GCViTBase-224x224": 48,
    "ResNest200-200x200": 64,
    "EfficientNetV2L-200x200": 32,
    "ResNetRS200-200x200": 32,
    "ResNet200D-200x200": 32,
}

NATIVE_SIZE = (200, 200)  # competition eval input spec (README.md:69)


def compiler_options() -> Optional[Dict[str, str]]:
    """VIPTPU_COMPILER_OPTIONS: comma-separated k=v backend compile options
    attached to the engine's jitted programs (they travel with the
    computation, so TPU-only flags work through the axon tunnel where
    XLA_FLAGS cannot — the local flag parser rejects unknown TPU flags).
    Example: VIPTPU_COMPILER_OPTIONS=xla_tpu_scoped_vmem_limit_kib=65536
    (pair with VIPTPU_VMEM_MB=64 so the pallas fold pickers use it)."""
    env = os.environ.get("VIPTPU_COMPILER_OPTIONS", "").strip()
    if not env:
        return None
    opts: Dict[str, str] = {}
    for kv in env.split(","):
        k, _, v = kv.partition("=")
        if k.strip():
            opts[k.strip()] = v.strip()
    return opts


def _agg_fn(agg: str):
    """jnp reduction for the reference's ``getattr(np, CFG.agg)`` semantics
    (main.py:111, :121)."""
    fn = getattr(jnp, agg, None)
    if fn is None:
        raise ValueError(f"unsupported agg {agg!r} (no jnp.{agg} reduction)")
    return fn


def load_manifest(model_dir: str, manifest_path: str, allow_missing: bool = False):
    """Resolve the ckpts.json manifest (reference main.py:186-197 semantics,
    extended to accept native .msgpack checkpoints next to .h5)."""
    entries = []
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    for base_dir, dim, idx in manifest:
        ckpt_dir = os.path.join(model_dir, base_dir, "ckpt")
        paths = sorted(glob(os.path.join(ckpt_dir, "*.msgpack"))) or sorted(
            glob(os.path.join(ckpt_dir, "*.h5"))
        )
        if not paths:
            sm = os.path.join(ckpt_dir, "saved_model.pb")
            if os.path.isfile(sm):
                paths = [sm]
        if not paths:
            if allow_missing:
                paths = []
            else:
                raise ValueError(f"no model found for : {base_dir}")
        entries.append((base_dir, paths, tuple(dim), idx))
    return entries


def registry_name(model_dir_name: str) -> str:
    """'ResNetRS50-200x200' -> 'ResNetRS50' (manifest dir naming convention)."""
    return model_dir_name.rsplit("-", 1)[0]


class EnsembleEngine:
    def __init__(
        self,
        mesh=None,
        compute_dtype=None,
        num_decode_threads: int = 16,
        verbose: int = 1,
    ):
        self.mesh = mesh if mesh is not None else get_mesh()
        if compute_dtype is None:
            # bf16 on TPU (MXU-native); f32 elsewhere (CPU tests / parity).
            # VIPTPU_DTYPE=float32|bfloat16 overrides — use float32 to measure
            # the bf16 decision-flip rate at thr=0.487 on a labeled set before
            # trusting bf16 for a new checkpoint family.
            env = os.environ.get("VIPTPU_DTYPE", "")
            if env:
                dtypes = {"float32": jnp.float32, "f32": jnp.float32,
                          "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}
                if env not in dtypes:
                    raise ValueError(
                        f"VIPTPU_DTYPE={env!r} not recognized; accepted "
                        f"spellings: {'|'.join(sorted(dtypes))}"
                    )
                compute_dtype = dtypes[env]
            else:
                compute_dtype = (
                    jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
                )
        self.compute_dtype = compute_dtype
        self.verbose = verbose
        self._decoder = ImageDecoder(num_threads=num_decode_threads)
        # decoded-image cache shared across ensemble members, keyed on the
        # path list so a second predict on a different CSV re-decodes
        self._decoded: Optional[List[np.ndarray]] = None
        self._decoded_key: Optional[Tuple[str, ...]] = None

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------
    def _decode_all(self, paths: Sequence[str]) -> List[np.ndarray]:
        """Decode every image once at NATIVE_SIZE (shared across the whole
        ensemble — the big structural win over the reference's per-model
        tf.data rebuild)."""
        key = tuple(paths)
        if self._decoded is None or self._decoded_key != key:
            imgs = self._decoder.decode_batch(paths)
            self._decoded = [_host_resize_uint8(im, NATIVE_SIZE) for im in imgs]
            self._decoded_key = key
        return self._decoded

    def reset_cache(self):
        self._decoded = None
        self._decoded_key = None

    def _decode_stream(self, paths: Sequence[str], batch_size: int):
        """Bounded-memory streaming decode (reference tf.data prefetch,
        dataset/dataset.py:100-101): yields (uint8 batch, n_valid) with the
        NEXT chunk decoding on the host pool while the caller's device
        compute for the CURRENT chunk runs. Host RAM stays O(2 batches)
        regardless of CSV length — `_decode_all`'s whole-set cache is kept
        only for the repeat-predict / sequential-member case."""
        post = lambda im: _host_resize_uint8(im, NATIVE_SIZE)  # noqa: E731
        pending = self._decoder.submit_batch(paths[:batch_size], post)
        for start in range(0, len(paths), batch_size):
            cur = [f.result() for f in pending]
            nxt = start + batch_size
            if nxt < len(paths):
                pending = self._decoder.submit_batch(
                    paths[nxt : nxt + batch_size], post
                )
            batch = np.zeros((batch_size, *NATIVE_SIZE, 3), np.uint8)
            if cur:
                batch[: len(cur)] = np.stack(cur)
            yield batch, len(cur)

    # ------------------------------------------------------------------
    # model construction
    # ------------------------------------------------------------------
    def _create_member(self, name: str, dim, overrides: Dict,
                       lazy: bool = False):
        """create_model with init on the CPU backend when running on an
        accelerator: jit-init through the axon tunnel costs minutes per
        model, CPU init is seconds. Callers must _place() the final
        variables (after weight transfer) onto the accelerator once.

        ``lazy``: build the variables pytree from ``jax.eval_shape`` of the
        module's init (zero compute — an abstract trace) and materialize
        zeros. Used when a checkpoint will overwrite every leaf anyway:
        the real jit-init of the 7-member ensemble costs minutes of the
        CLI's cold start (measured e2e: ~6 min wall, device infer ~10 s),
        all of it thrown away by transfer_weights. Any leaf the checkpoint
        does NOT cover stays zero, and transfer_weights' mismatch warning
        flags it (engine fold checkpoints always cover all leaves)."""
        cpu = None
        if jax.default_backend() != "cpu":
            try:
                cpu = jax.devices("cpu")[0]
            except Exception:
                cpu = None

        def build():
            if not lazy:
                return create_model(
                    name, input_size=tuple(dim), dtype=self.compute_dtype,
                    **overrides
                )
            module, _, cfg = create_model(
                name, input_size=tuple(dim), dtype=self.compute_dtype,
                init=False, **overrides
            )
            rng = jax.random.PRNGKey(0)
            dummy = jax.ShapeDtypeStruct(
                (1, *cfg.input_size, cfg.in_channels), jnp.float32)
            shapes = jax.eval_shape(module.init, rng, dummy)
            variables = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)
            return module, variables, cfg

        if cpu is not None:
            with jax.default_device(cpu):
                return build()
        return build()

    def _place(self, variables):
        """Commit a variables pytree to the accelerator (no-op on CPU)."""
        if jax.default_backend() == "cpu":
            return variables
        return jax.device_put(variables, jax.devices()[0])

    # ------------------------------------------------------------------
    # per-model forward program
    # ------------------------------------------------------------------
    def _build_forward(self, module, dim: Tuple[int, int], tta: int,
                       agg: str = "mean"):
        compute_dtype = self.compute_dtype
        agg_fn = _agg_fn(agg)

        def forward(variables, u8, rng):
            x = u8.astype(jnp.float32) / 255.0  # dataset.py:31-37
            if tuple(dim) != NATIVE_SIZE:
                x = resize(x, dim, method="bicubic")  # dataset.py:33-34
            x = x.astype(compute_dtype)
            if tta > 1:
                def one(key):
                    return module.apply(variables, apply_augment(key, x))
                preds = jax.lax.map(one, jax.random.split(rng, tta))
                return agg_fn(preds.astype(jnp.float32), axis=0)
            return module.apply(variables, x).astype(jnp.float32)

        return jax.jit(forward, in_shardings=(None, batch_sharding(self.mesh), None),
                       out_shardings=batch_sharding(self.mesh),
                       compiler_options=compiler_options())

    # ------------------------------------------------------------------
    # int8 quantized inference (quant/ptq.py; VIPTPU_INT8)
    # ------------------------------------------------------------------
    # Members where the PTQ int8 path is a measured THROUGHPUT WIN on v5e
    # (NOTES_r3 member A/Bs: ResNetRS50 +17%, ResNest50 +6%; ECA_NFNetL0
    # -5%, EfficientNetV2T -7%, EfficientNetV1B4 -14% — their depthwise-
    # heavy graphs pay more in requant than the MXU saves). This is the
    # 'auto' set, the production default on TPU.
    INT8_AUTO = ("ResNetRS50", "ResNest50")

    @staticmethod
    def _int8_names() -> set:
        """VIPTPU_INT8: 'auto' (default on TPU — the INT8_AUTO measured-win
        set), '0'/'off' (disable), '1'/'all' (every member), or a comma list
        of registry names ('ResNetRS50,ECA_NFNetL0'). Members run the PTQ
        int8 conv/dense path (quant/ptq.py) after a one-batch calibration.
        Decision parity is measured (tools/flip_rate.py --int8, PARITY.md):
        re-measure before trusting int8 for a new checkpoint family, exactly
        as with bf16. Off-TPU the default is off (the int8 path exists for
        parity tests but CPU has no int8 matrix unit)."""
        env = os.environ.get("VIPTPU_INT8", "auto").strip()
        if env.lower() == "auto":
            if jax.default_backend() != "tpu":
                return set()
            return set(EnsembleEngine.INT8_AUTO)
        if not env or env.lower() in ("0", "off", "false"):
            return set()
        if env.lower() in ("1", "all", "true"):
            return {"*"}
        return {s.strip() for s in env.split(",") if s.strip()}

    @staticmethod
    def _fuse_bn_member(name: str) -> bool:
        """VIPTPU_FUSE_BN: '' (off), '1'/'all', or a comma list of registry
        names. Folds every conv->BN pair into the conv weights at load time
        (utils/surgery.fuse_all_conv_bn). XLA already folds inference BN
        into the conv epilogue for plain residual CNNs (measured ~0 on
        ResNetRS50), but it CANNOT when a concat/split sits between conv
        and BN — ResNest50 measured +2% fused (NOTES_r3)."""
        env = os.environ.get("VIPTPU_FUSE_BN", "").strip()
        if not env:
            return False
        if env.lower() in ("1", "all", "true"):
            return True
        return name in {s.strip() for s in env.split(",")}

    def _fuse_bn(self, variables, name: str):
        from ..utils.surgery import fuse_all_conv_bn

        fused, pairs = fuse_all_conv_bn(variables)
        if self.verbose and pairs:
            print(f"> FUSE_BN {name}: folded {len(pairs)} conv->BN pairs")
        return fused

    def _calibrate_member(self, module, variables, dim, calib_u8):
        """One-batch jitted calibration pass: returns the per-site activation
        abs-max table for quant/ptq.quantized. Runs as ONE compiled program
        (eager per-op dispatch is 26-800 ms/op through the TPU tunnel)."""
        from ..quant import calibrate

        compute_dtype = self.compute_dtype

        def apply_one(u8):
            x = u8.astype(jnp.float32) / 255.0
            if tuple(dim) != NATIVE_SIZE:
                x = resize(x, dim, method="bicubic")
            return module.apply(variables, x.astype(compute_dtype))

        return calibrate(apply_one, [calib_u8], use_jit=True)

    def build_fused_ensemble(self, members, tta: int = 1, agg: str = "mean",
                             sharded: bool = True, quant_scales=None):
        """One jitted program for the WHOLE ensemble (SURVEY.md §7 config 4):
        shared uint8 input -> per-member resize/normalize -> all member
        forwards back-to-back -> agg over TTA copies of the raw class probs,
        multiclass->binary, agg over folds, mean over members — entirely on
        device, preserving the reference's nested aggregation order
        (main.py:111 TTA-agg precedes the :113-114 binary map; :121 fold agg;
        :142-143 member mean). XLA schedules the members as one graph; one
        dispatch per batch instead of per member x fold x batch.

        ``members``: list of (module, dim) — call with ``all_variables``, a
        list (per member) of lists (per fold) of variables pytrees. Returns
        fn(all_variables, u8, rng) -> (B, 1) ensemble-mean probability.

        ``quant_scales``: optional per-member list; a non-None entry is a
        calibration table from :meth:`_calibrate_member` and that member's
        eligible convs/denses run the int8 MXU path (quant/ptq.py).
        """
        compute_dtype = self.compute_dtype
        specs = [(module, tuple(dim)) for module, dim in members]
        agg_fn = _agg_fn(agg)
        applies = []
        for i, (module, _dim) in enumerate(specs):
            scales = quant_scales[i] if quant_scales else None
            if scales:
                from ..quant import quantized

                applies.append(quantized(module.apply, scales))
            else:
                applies.append(module.apply)

        def to_binary(p):
            if p.ndim == 1:
                p = p[:, None]
            if p.shape[1] > 1:
                p = 1.0 - p[:, 0:1]  # multiclass -> binary (main.py:113-114)
            return p

        # TTA execution strategy (identical math, same per-replica keys):
        #   map  — jax.lax.map over TTA replicas: tta sequential forwards at
        #          batch B (the reference's per-replica predict loop,
        #          main.py:89-98)
        #   fold — concatenate the tta augmented copies along the BATCH axis
        #          and run ONE forward at tta*B, then reduce; fills the MXU
        #          when B alone is small. Callers should shrink B so tta*B
        #          stays at the tuned 256 (the ConvNeXt batch-lane kernel
        #          rejects 512-lane folds).
        tta_mode = os.environ.get("VIPTPU_TTA_MODE", "map").strip().lower()
        if tta_mode not in ("map", "fold"):
            raise ValueError(f"VIPTPU_TTA_MODE={tta_mode!r} not in map|fold")

        def forward(all_variables, u8, rng):
            if tta > 1:
                # under shard_map each shard must draw DISTINCT augment
                # keys; outside (1-device/unsharded) fold_in(0) is a no-op
                # difference applied uniformly, so results stay deterministic
                try:
                    rng = jax.random.fold_in(
                        rng, jax.lax.axis_index("data"))
                except NameError:  # not inside shard_map: keep global key
                    pass
            x0 = u8.astype(jnp.float32) / 255.0
            # one resize per DISTINCT member size (GCViT + EffV1B4 share 224)
            by_dim = {}
            for _, dim in specs:
                if dim not in by_dim:
                    by_dim[dim] = (
                        resize(x0, dim, method="bicubic")
                        if dim != NATIVE_SIZE else x0
                    ).astype(compute_dtype)
            preds = []
            for (module, dim), apply_fn, fold_vars in zip(
                specs, applies, all_variables
            ):
                x = by_dim[dim]
                fold_preds = []
                for variables in fold_vars:
                    if tta > 1 and tta_mode == "fold":
                        keys = jax.random.split(rng, tta)
                        xs = jnp.concatenate(
                            [apply_augment(keys[t], x) for t in range(tta)], 0
                        )
                        outs = apply_fn(variables, xs).astype(jnp.float32)
                        outs = outs.reshape(tta, x.shape[0], *outs.shape[1:])
                        fold_preds.append(to_binary(agg_fn(outs, axis=0)))
                    elif tta > 1:
                        def one(key, x=x, apply_fn=apply_fn, variables=variables):
                            return apply_fn(
                                variables, apply_augment(key, x)
                            ).astype(jnp.float32)

                        outs = jax.lax.map(one, jax.random.split(rng, tta))
                        fold_preds.append(to_binary(agg_fn(outs, axis=0)))
                    else:
                        fold_preds.append(
                            to_binary(apply_fn(variables, x).astype(jnp.float32))
                        )
                preds.append(agg_fn(jnp.stack(fold_preds), axis=0))
            return jnp.mean(jnp.stack(preds), axis=0)

        if not sharded:
            # unsharded program: what the relocatable serving artifact
            # exports (a per-chip program, replicated by the serving layer —
            # reference per-replica predict split, main.py:106-109)
            return jax.jit(forward, compiler_options=compiler_options())
        # Manual SPMD via shard_map: the ensemble is embarrassingly batch-
        # parallel, so each device runs the complete per-shard program with
        # ZERO collectives — the TPU-native form of the reference's
        # per-replica predict split (main.py:106-109). Under plain
        # jit+GSPMD the pallas custom calls (no sharding rule) forced
        # replicate-reshard all-to-alls around every fused block, and the
        # output picked up an all-gather; both are gone here, and the
        # result stays batch-sharded (the host fetch gathers).
        # check_rep=False: replication checking can't see through the
        # pallas custom calls.
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        sharded_fwd = shard_map(
            forward, mesh=self.mesh,
            in_specs=(P(), P("data"), P()), out_specs=P("data"),
            check_rep=False,
        )
        return jax.jit(sharded_fwd, compiler_options=compiler_options())

    # ------------------------------------------------------------------
    # prediction
    # ------------------------------------------------------------------
    def predict_model(
        self,
        model_dir_name: str,
        ckpt_paths: Sequence[str],
        dim: Tuple[int, int],
        paths: Sequence[str],
        tta: int = 1,
        agg: str = "mean",
        batch_size: Optional[int] = None,
        seed: int = 42,
    ) -> np.ndarray:
        """Predict one ensemble member over all folds. Returns (N, 1) probs."""
        name = registry_name(model_dir_name)
        if batch_size is None:
            batch_size = 8 * NAME2BS.get(model_dir_name, 16)  # main.py:85
        max_batch = int(os.environ.get("VIPTPU_MAX_BATCH", "0"))
        if max_batch:
            batch_size = min(batch_size, max_batch)
        batch_size = pad_to_multiple(batch_size, num_replicas(self.mesh))

        # sidecar config.json next to the checkpoints carries head/config
        # overrides recorded at conversion time (nb_classes, activation, ...)
        overrides: Dict = {}
        if ckpt_paths:
            cfg_json = os.path.join(os.path.dirname(ckpt_paths[0]), "config.json")
            if os.path.isfile(cfg_json):
                with open(cfg_json) as fh:
                    overrides = json.load(fh)
                overrides.pop("input_size", None)
        module, variables, cfg = self._create_member(
            name, dim, overrides, lazy=bool(ckpt_paths))
        fwd = self._build_forward(module, dim, tta, agg=agg)
        imgs = self._decode_all(paths)
        n = len(imgs)

        fold_preds = []
        rng = jax.random.PRNGKey(seed)
        for fold_idx, ckpt in enumerate(sorted(ckpt_paths) if ckpt_paths else [None]):
            if ckpt is not None:
                loaded = load_weights(ckpt, name)
                variables = self._place(transfer_weights(loaded, variables))
            elif fold_idx == 0:
                variables = self._place(variables)
            # keep per-batch outputs on device; jax's async dispatch overlaps
            # batch N+1's H2D transfer with batch N's compute, and the single
            # host fetch at the end avoids a per-batch roundtrip
            device_chunks, valid = [], []
            for start in range(0, n, batch_size):
                chunk = imgs[start : start + batch_size]
                batch = np.zeros((batch_size, *NATIVE_SIZE, 3), np.uint8)
                batch[: len(chunk)] = np.stack(chunk)
                rng, sub = jax.random.split(rng)
                device_chunks.append(fwd(variables, batch, sub))
                valid.append(len(chunk))
            pred = np.concatenate(
                [np.asarray(out)[:nv] for out, nv in zip(device_chunks, valid)], axis=0
            )
            if pred.ndim == 1:
                pred = pred[:, None]
            if pred.shape[1] > 1:  # multiclass -> binary (main.py:113-114)
                pred = 1.0 - pred[:, 0:1]
            fold_preds.append(pred)
        return getattr(np, agg)(fold_preds, axis=0)

    def predict_soln_fused(self, cfg):
        """Fast path (the default): the whole ensemble — every member and
        every fold — as ONE jitted program per batch. Same CSV contract and
        aggregation order as predict_soln."""
        test_csv = pd.read_csv(cfg.test_csv)
        test_names = test_csv.filename.values
        test_paths = [os.path.join(cfg.infer_path, n) for n in test_names]
        if cfg.debug:
            test_paths = test_paths[:100]
            test_names = test_names[:100]

        members, all_variables = [], []
        for base_dir, ckpt_paths, dim, idx in cfg.ckpt_cfg:
            name = registry_name(base_dir)
            overrides: Dict = {}
            if ckpt_paths:
                cfg_json = os.path.join(os.path.dirname(ckpt_paths[0]), "config.json")
                if os.path.isfile(cfg_json):
                    with open(cfg_json) as fh:
                        overrides = json.load(fh)
                    overrides.pop("input_size", None)
            module, variables, _ = self._create_member(
                name, dim, overrides, lazy=bool(ckpt_paths))
            fuse_bn = self._fuse_bn_member(name)
            fold_vars = []
            for ckpt in sorted(ckpt_paths):
                loaded = transfer_weights(load_weights(ckpt, name), variables)
                if fuse_bn:
                    loaded = self._fuse_bn(loaded, name)
                fold_vars.append(self._place(loaded))
            if not fold_vars:  # random-init (allow_missing) member
                v0 = self._fuse_bn(variables, name) if fuse_bn else variables
                fold_vars = [self._place(v0)]
            members.append((module, tuple(dim)))
            all_variables.append(fold_vars)

        # optional int8 members (VIPTPU_INT8): one-batch calibration on the
        # head of the CSV, then their convs/denses run the MXU int8 path
        int8_names = self._int8_names()
        quant_scales = None
        if int8_names:
            n_cal = min(int(os.environ.get("VIPTPU_INT8_CALIB", "64")),
                        len(test_paths))
            cal_imgs = [
                _host_resize_uint8(im, NATIVE_SIZE)
                for im in self._decoder.decode_batch(test_paths[:n_cal])
            ]
            calib_u8 = np.stack(cal_imgs) if cal_imgs else np.zeros(
                (1, *NATIVE_SIZE, 3), np.uint8
            )
            quant_scales = []
            for (module, dim), fold_vars, (base_dir, *_rest) in zip(
                members, all_variables, cfg.ckpt_cfg
            ):
                name = registry_name(base_dir)
                if "*" in int8_names or name in int8_names:
                    scales = self._calibrate_member(
                        module, fold_vars[0], dim, calib_u8
                    )
                    if self.verbose:
                        print(f"> INT8 {name}: {len(scales)} calibrated sites")
                    quant_scales.append(scales)
                else:
                    quant_scales.append(None)

        fwd = self.build_fused_ensemble(
            members, tta=cfg.tta, agg=cfg.agg, quant_scales=quant_scales
        )
        # default batch 256: tuned on v5e (B=512 measured worse, see bench.py)
        batch_size = pad_to_multiple(
            int(os.environ.get("VIPTPU_MAX_BATCH", "0")) or 256, num_replicas(self.mesh)
        )
        # streaming by default: decode overlaps compute, RAM is O(2 batches).
        # The in-RAM decoded cache is used only when a previous call (e.g. the
        # sequential path over the same CSV) already populated it.
        if self._decoded is not None and self._decoded_key == tuple(test_paths):
            imgs = self._decoded

            def _batches():
                for start in range(0, len(imgs), batch_size):
                    chunk = imgs[start : start + batch_size]
                    batch = np.zeros((batch_size, *NATIVE_SIZE, 3), np.uint8)
                    batch[: len(chunk)] = np.stack(chunk)
                    yield batch, len(chunk)

            batches = _batches()
        else:
            batches = self._decode_stream(test_paths, batch_size)
        rng = jax.random.PRNGKey(cfg.seed)
        # VIPTPU_E2E_BATCH_TIMES=<path>: diagnostic mode — fetch each batch
        # synchronously and record its end-to-end latency (decode wait + H2D +
        # compute + D2H) to a JSON file. Default path stays fully pipelined
        # (dispatches queue; one fetch at the end).
        times_path = os.environ.get("VIPTPU_E2E_BATCH_TIMES", "")
        outs, valid, batch_times = [], [], []
        for batch, n_valid in batches:
            rng, sub = jax.random.split(rng)
            if times_path:
                t0 = time.perf_counter()
                outs.append(np.asarray(fwd(all_variables, batch, sub)))
                batch_times.append(time.perf_counter() - t0)
            else:
                outs.append(fwd(all_variables, batch, sub))
            valid.append(n_valid)
        if times_path:
            with open(times_path, "w") as fh:
                json.dump({"batch_size": batch_size,
                           "batch_e2e_s": batch_times}, fh)
        pred = np.concatenate([np.asarray(o)[:nv] for o, nv in zip(outs, valid)], 0)

        out_df = pd.DataFrame({"filename": np.array(test_names), "logit": pred[:, 0]})
        out_df = out_df.sort_values("filename").reset_index(drop=True)
        out_df["raw"] = out_df.logit.astype(np.float64)  # pre-binarization mean
        out_df["logit"] = (out_df.logit > cfg.thr) * 1.0
        out_df[["filename", "logit"]].to_csv(cfg.output_csv_path, index=False)
        if cfg.verbose:
            print("\n> FINAL PREDICTION SAVED TO ", cfg.output_csv_path)
        return out_df

    def predict_soln(self, cfg, ensemble: bool = True):
        """Reference-contract driver (main.py:58-149). ``cfg`` is the untyped
        Config bag with the same fields main.py populates."""
        if cfg.verbose == 1:
            print("=" * 35)
            print("### INFERENCE ###")
            print("=" * 35)

        test_csv = pd.read_csv(cfg.test_csv)
        test_names = test_csv.filename.values
        test_paths = [os.path.join(cfg.infer_path, n) for n in test_names]
        if cfg.debug:
            test_paths = test_paths[:100]
            test_names = test_names[:100]

        pred_dfs = []
        for model_idx, (base_dir, ckpt_paths, dim, idx) in enumerate(cfg.ckpt_cfg):
            if cfg.verbose:
                print(
                    f"> MODEL({model_idx + 1}/{len(cfg.ckpt_cfg)}): {base_dir} | DIM: {list(dim)}"
                )
            t0 = time.time()
            preds = self.predict_model(
                base_dir,
                ckpt_paths,
                dim,
                test_paths,
                tta=cfg.tta,
                agg=cfg.agg,
                seed=cfg.seed,
            )
            if cfg.verbose:
                dt = time.time() - t0
                print(f"  {len(test_paths)} imgs in {dt:.2f}s ({len(test_paths) * max(cfg.tta,1) / max(dt, 1e-9):.1f} img/s)")
            pred_df = pd.DataFrame(
                {"filename": np.array(test_names), "logit": preds[:, 0].astype(np.float64)}
            )
            pred_df = test_csv.merge(pred_df, on=["filename"], how="right").reset_index(drop=True)
            pred_dfs.append(pred_df)

        if ensemble:
            dfs = pd.concat(pred_dfs)
            out_df = dfs.groupby("filename")[["logit"]].mean().reset_index()
            out_df["logit"] = (out_df.logit > cfg.thr) * 1.0  # main.py:144
            out_df.to_csv(cfg.output_csv_path, index=False)
            if cfg.verbose:
                print("\n> FINAL PREDICTION SAVED TO ", cfg.output_csv_path)
                print(out_df.head(2))
            return out_df
        return pred_dfs
