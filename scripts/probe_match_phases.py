#!/usr/bin/env python
"""Where does the matcher's time go? Amortized per-phase probes at K=512/2048."""

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

from sosvo.frontend.match import (BIG, match, column_band_penalty,
                                  hamming_matrix_mxu, unpack_bits_pm1)

REPS = 2000


def timed(fn, *args):
    block = jax.jit(fn)
    jax.block_until_ready(block(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(block(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / REPS * 1e6  # us


def loop(body, init):
    def f(x):
        return jax.lax.fori_loop(0, REPS, lambda _, c: body(c), x)
    return f


def bench_k(k):
    da = jax.random.randint(jax.random.PRNGKey(0), (k, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    db = jax.random.randint(jax.random.PRNGKey(1), (k, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    va = jnp.ones((k,), bool)
    vb = jnp.ones((k,), bool)
    az_a = jax.random.uniform(jax.random.PRNGKey(2), (k,), minval=-3.14, maxval=3.14)

    # 1. unpack only (descriptor depends on carry so it can't be hoisted)
    def unpack_body(c):
        u = unpack_bits_pm1(c)
        return c ^ (jnp.sum(u.astype(jnp.float32)) > 1e30).astype(jnp.uint32)
    t_unpack = timed(loop(unpack_body, da), da)

    # 2. dist matrix only (unpack + matmul)
    def dist_body(c):
        d = hamming_matrix_mxu(c, db)
        return c ^ (jnp.sum(d) > 1e30).astype(jnp.uint32)
    t_dist = timed(loop(dist_body, da), da)

    # 3. full match, no penalty
    def match_body(c):
        m = match(c, db, va, vb, max_distance=80.0, ratio=0.9)
        return c ^ (jnp.sum(m.dist) > 1e30).astype(jnp.uint32)
    t_match = timed(loop(match_body, da), da)

    # 4. full match + band penalty
    def match_band_body(c):
        pen = column_band_penalty(az_a, az_a, 0.06, wrap=2.0 * float(jnp.pi))
        m = match(c, db, va, vb, max_distance=80.0, ratio=0.9, penalty=pen)
        return c ^ (jnp.sum(m.dist) > 1e30).astype(jnp.uint32)
    t_band = timed(loop(match_band_body, da), da)

    return {"K": k, "unpack_us": round(t_unpack, 1), "dist_us": round(t_dist, 1),
            "match_us": round(t_match, 1), "match_band_us": round(t_band, 1)}


def main():
    print(json.dumps({"rows": [bench_k(512), bench_k(2048)]}, indent=2))


if __name__ == "__main__":
    main()
