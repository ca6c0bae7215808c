#!/usr/bin/env python
"""Per-sub-stage microbench of the RANSAC + refine path (amortized in-device).

Separates the VO step's dominant phase (TPU phase table, BASELINE.md) into:
Gumbel-top-k sampling (S=3 and S=8), minimal fits (rigid 3-point closed form;
essential inverse-iteration with batched 9x9 Cholesky), hypothesis scoring,
Umeyama/eigh refits, and the IRLS bearing refine -- so optimization effort
lands where the microseconds are.
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

from sosvo.backend.refine import refine_pose_bearings
from sosvo.geom.lie import se3_exp
from sosvo.geometry.align import rigid_from_three_points, umeyama
from sosvo.geometry.essential import fit_essential, fit_essential_fast
from sosvo.geometry.ransac import sample_minimal_sets

REPS = 1000


def time_loop(body, carry0, reps=REPS):
    loop = jax.jit(lambda c: jax.lax.fori_loop(0, reps, lambda _, c: body(c), c))
    jax.block_until_ready(loop(carry0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(carry0))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / reps


def main(h: int = 512, k: int = 512):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    valid = jax.random.uniform(ks[0], (k,)) < 0.7
    logits = -jax.random.uniform(ks[1], (k,))
    T_h = se3_exp(0.3 * jax.random.normal(ks[2], (h, 6)))
    pts = 4.0 * jax.random.normal(ks[3], (k, 3))
    pts2 = pts + 0.05 * jax.random.normal(ks[4], pts.shape)
    r1 = jax.random.normal(ks[5], (k, 3))
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = jax.random.normal(ks[6], (k, 3))
    r2 = r2 / jnp.linalg.norm(r2, axis=-1, keepdims=True)
    w = valid.astype(jnp.float32)

    t = {}

    # sampling: carry = key folded from output indices
    def samp(s, key0):
        def body(c):
            kk = jax.random.fold_in(key0, c)
            idx = sample_minimal_sets(kk, valid, h, s, logits=logits)
            return c + (idx[0, 0] % 2).astype(jnp.int32)
        return body

    t["sample_s3"] = time_loop(samp(3, ks[7]), jnp.int32(0))
    t["sample_s8"] = time_loop(samp(8, ks[7]), jnp.int32(0))

    idx3 = sample_minimal_sets(ks[7], valid, h, 3, logits=logits)
    idx8 = sample_minimal_sets(ks[7], valid, h, 8)

    def rigid_fit(p):
        T = rigid_from_three_points(p[idx3], pts2[idx3])
        return p + jnp.sum(T) * jnp.float32(1e-38)

    t["rigid_fit_3pt"] = time_loop(rigid_fit, pts)

    w8 = jnp.ones(idx8.shape, jnp.float32)

    def ess_fit(a):
        E = fit_essential_fast(a[idx8], r2[idx8], w8)
        return a + jnp.sum(E) * jnp.float32(1e-38)

    t["ess_fit_fast"] = time_loop(ess_fit, r1)

    def umeyama_refit(p):
        T, _ = umeyama(p, pts2, weights=w)
        return p + jnp.sum(T) * jnp.float32(1e-38)

    t["umeyama_refit"] = time_loop(umeyama_refit, pts)

    def ess_refit(a):
        E = fit_essential(a, r2, w)
        return a + jnp.sum(E) * jnp.float32(1e-38)

    t["ess_refit_eigh"] = time_loop(ess_refit, r1, reps=200)

    def refine(T):
        return refine_pose_bearings(T, pts, r2, w)

    t["refine_irls6"] = time_loop(refine, jnp.eye(4, dtype=jnp.float32), reps=500)

    print(json.dumps({
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0].device_kind),
        "H": h, "K": k,
        "us": {n: round(v * 1e6, 1) for n, v in t.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
