#!/usr/bin/env python
"""Matcher microbench: Pallas fused kernel vs XLA path at K in {512, 2048}.

Amortized in-device timing (CLAUDE.md: per-dispatch TPU timing carries ~26 ms
tunnel RPC latency) -- N calls chained inside one jitted fori_loop, divided by
N. Decides VERDICT round-1 item 1c: the kernel must beat XLA at real sizes or
be retired with recorded numbers (BASELINE.md kernel table).
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import statistics
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sosvo_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from sosvo.frontend.match import match, column_band_penalty
from sosvo.kernels.match_pallas import match_pallas

REPS = 2000


def time_block(fn, *args):
    block = jax.jit(fn)
    jax.block_until_ready(block(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(block(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / REPS


def bench_k(k: int) -> dict:
    key = jax.random.PRNGKey(0)
    ka = kb = k
    da = jax.random.randint(key, (ka, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    db = jax.random.randint(jax.random.PRNGKey(1), (kb, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    va = jnp.ones((ka,), bool)
    vb = jnp.ones((kb,), bool)
    az_a = jax.random.uniform(jax.random.PRNGKey(2), (ka,), minval=-jnp.pi, maxval=jnp.pi)
    az_b = jax.random.uniform(jax.random.PRNGKey(3), (kb,), minval=-jnp.pi, maxval=jnp.pi)
    band = 0.06

    # Each rep's azimuths depend (vanishingly, +dist*1e-38) on the previous
    # rep's output: a real loop-carried dependency, so XLA cannot hoist the
    # loop-invariant match out of the fori_loop (bench.py protocol).
    def xla_loop(da, db):
        def body(_, az):
            pen = column_band_penalty(az, az_b, band, wrap=2.0 * float(jnp.pi))
            m = match(da, db, va, vb, max_distance=80.0, ratio=0.9, penalty=pen)
            return az + jnp.sum(m.dist) * jnp.float32(1e-38)
        return jax.lax.fori_loop(0, REPS, body, az_a)

    def pallas_loop(da, db):
        def body(_, az):
            m = match_pallas(da, db, va, vb, max_distance=80.0, ratio=0.9,
                             az_a=az, az_b=az_b, band=band)
            return az + jnp.sum(m.dist) * jnp.float32(1e-38)
        return jax.lax.fori_loop(0, REPS, body, az_a)

    t_xla = time_block(xla_loop, da, db)
    t_pal = time_block(pallas_loop, da, db)
    return {"K": k, "xla_us": round(t_xla * 1e6, 1), "pallas_us": round(t_pal * 1e6, 1),
            "speedup_pallas_vs_xla": round(t_xla / t_pal, 3)}


def main():
    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0].device_kind),
           "rows": [bench_k(512), bench_k(2048)]}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
