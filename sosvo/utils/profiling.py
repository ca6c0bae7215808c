"""Profiling + speed-of-light accounting (SURVEY.md section 5.1).

`trace()` wraps jax.profiler for Perfetto/XPlane traces; `time_jitted`
benches a compiled callable (compile excluded, median of n); `roofline_*`
compute the hardware bounds the kernels are judged against (BASELINE.json:5
"speed-of-light per chip", BASELINE.md per-kernel table).
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Callable

import jax

# TPU v5e (1 chip) nominal numbers; update per chip type when porting.
V5E_BF16_FLOPS = 394e12      # MXU bf16 peak FLOP/s
V5E_HBM_GBS = 819e9          # HBM bandwidth bytes/s


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sosvo_trace"):
    """Perfetto/XPlane trace of the enclosed block (view with xprof/tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn: Callable, *args, n: int = 10, warmup: int = 1) -> float:
    """Median wall seconds of `fn(*args)` with block_until_ready, post-warmup."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def roofline_matcher(ka: int, kb: int, nbits: int = 256) -> dict:
    """Speed-of-light bounds for the Hamming matcher at (ka, kb).

    Compute: the +/-1 matmul is 2*ka*kb*nbits FLOPs on the MXU.
    Memory: descriptors + small per-row outputs only (the fused kernel never
    writes the distance matrix); the XLA path adds 2 * 4*ka*kb bytes of
    distance-matrix traffic (one write + one read).
    """
    flops = 2.0 * ka * kb * nbits
    bytes_fused = (ka + kb) * (nbits // 8) + (ka * 3 + kb) * 4
    bytes_xla = bytes_fused + 2 * 4.0 * ka * kb
    return {
        "flops": flops,
        "t_compute_s": flops / V5E_BF16_FLOPS,
        "t_mem_fused_s": bytes_fused / V5E_HBM_GBS,
        "t_mem_xla_s": bytes_xla / V5E_HBM_GBS,
        "sol_fused_s": max(flops / V5E_BF16_FLOPS, bytes_fused / V5E_HBM_GBS),
        "sol_xla_s": max(flops / V5E_BF16_FLOPS, bytes_xla / V5E_HBM_GBS),
    }


def roofline_schur(W: int, L: int) -> dict:
    """FLOP bound of the Schur reduction H_cl H_ll^-1 H_lc (per LM iteration)."""
    flops = 2.0 * L * (W * 6 * 3 * 3 + W * W * 6 * 6 * 3)  # A = H_cl Hll^-1; S = A H_cl^T
    byts = L * (W * 6 * 3 + 3 * 3 + 3) * 4.0
    return {
        "flops": flops,
        "t_compute_s": flops / (V5E_BF16_FLOPS / 2),  # f32 MXU rate ~ half bf16
        "t_mem_s": byts / V5E_HBM_GBS,
        "sol_s": max(flops / (V5E_BF16_FLOPS / 2), byts / V5E_HBM_GBS),
    }


def time_amortized(fn: Callable, x, inner: int = 16, n: int = 5) -> float:
    """Median per-call seconds of `fn(x)`, amortized inside ONE jitted scan.

    On the remote-TPU tunnel every dispatch carries ~26 ms of RPC latency
    (CLAUDE.md), so per-dispatch timing is meaningless; this runs `inner`
    dependent applications of `fn` inside a single dispatch and divides.
    `x` must be a pytree whose first float leaf exists; a vanishing
    perturbation from each output is folded back into the carry so XLA
    cannot hoist or dead-code the loop body.
    """
    import jax.numpy as jnp

    def fold(c, out):
        leaves = [l for l in jax.tree.leaves(out)
                  if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
        eps = sum(jnp.sum(l) for l in leaves) * jnp.float32(1e-38)

        def leaf(a):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
                return a + eps.astype(a.dtype)
            return a
        return jax.tree.map(leaf, c)

    def body(c, _):
        return fold(c, fn(c)), None

    f = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=inner)[0])
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / inner
