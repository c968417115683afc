"""Shared measurement helpers for on-chip kernel experiments.

Axon-tunnel measurement rules (NOTES_r2 + round-3 findings):
- per-dispatch overhead is large and VARIABLE (26 ms healthy, 400-700 ms
  degraded), so absolute single-call times are useless — time chains of K
  and 4K iterations and report the marginal; fixed costs cancel exactly.
- the round-trip is LATENCY, not serialized work: device compute overlaps
  with it, so a chain whose compute is shorter than the latency window
  measures ~0 marginal (r3: 8192^3 GEMM chains at 8/32 iters both totalled
  ~400 ms). Size iters so the 4K chain's compute is >= 2-3x the round-trip.
- XLA's while-loop simplifier can constant-fold trivial bodies (u + 1.0
  chained 100x became u + 100), silently measuring nothing: chain the real
  op under test with its own output, never a synthetic body.
- the runtime memoizes identical dispatches: bump the input between reps.
- block_until_ready is not a sync point through the tunnel; fetch a small
  slice of the final output instead (device execution is ordered).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_marginal(name, fn, x, iters=8, reps=3, label_width=12):
    """Marginal ms per application of shape-preserving ``fn`` via differenced
    fori_loop chains (K vs 4K). Prints and returns the marginal (ms), or
    None on failure."""
    k1, k2 = iters, 4 * iters

    def run(k):
        f = jax.jit(lambda v: jax.lax.fori_loop(0, k, lambda i, u: fn(u), v))
        t0 = time.time()
        r = f(x)
        np.asarray(jax.jit(lambda a: a.reshape(-1)[:8])(r))
        compile_s = time.time() - t0
        best = float("inf")
        # bump must be non-zero in the input dtype: +0.001 rounds to 0 for
        # integer inputs and the runtime then memoizes the identical dispatch
        bump = 1 if jnp.issubdtype(x.dtype, jnp.integer) else 0.001
        x2 = x
        for _ in range(reps):
            x2 = jax.jit(lambda a: a + jnp.asarray(bump, a.dtype))(x2)
            jax.block_until_ready(x2)
            t0 = time.time()
            r = f(x2)
            np.asarray(jax.jit(lambda a: a.reshape(-1)[:8])(r))
            best = min(best, time.time() - t0)
        return best, compile_s

    try:
        t1, c1 = run(k1)
        t2, c2 = run(k2)
    except Exception as e:  # noqa: BLE001
        print(f"  {name:{label_width}s}  FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return None
    per = (t2 - t1) / (k2 - k1) * 1e3
    print(f"  {name:{label_width}s}  {per:8.2f} ms   (compile {c1:.0f}+{c2:.0f}s,"
          f" totals {t1*1e3:.0f}/{t2*1e3:.0f} ms @ {k1}/{k2})", flush=True)
    return per


def device_randn(shape, dtype, seed=1):
    """Generate a test array ON device (never device_put large host arrays
    through the tunnel)."""
    x = jax.jit(
        lambda k: jax.random.normal(k, shape, dtype)
    )(jax.random.PRNGKey(seed))
    jax.block_until_ready(x)
    return x
