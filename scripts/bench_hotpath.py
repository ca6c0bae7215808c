#!/usr/bin/env python
"""Post-rework timing of the c1 per-frame hot path pieces on the live backend.

Covers the reworked essential stage (unrolled Cholesky fit, cofactor
decompose) and the remaining per-frame serial solvers (Procrustes/umeyama
refit, bearing refine) so the next optimization target is named by data.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sosvo_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--hyps", type=int, default=512)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from sosvo.backend.refine import refine_pose_bearings
    from sosvo.geometry.align import procrustes_rotation, umeyama
    from sosvo.geometry.essential import decompose_essential, fit_essential_fast, fit_essential_refit
    from sosvo.geometry.ransac import ransac_essential, ransac_rigid, sample_minimal_sets
    from sosvo.utils.profiling import time_amortized

    K, H = args.k, args.hyps
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    r1 = jax.random.normal(k1, (K, 3))
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = r1 + 0.05 * jax.random.normal(k2, (K, 3))
    r2 = r2 / jnp.linalg.norm(r2, axis=-1, keepdims=True)
    valid = jnp.ones((K,), bool)
    w = jnp.ones((K,), jnp.float32)
    pts = r1 * (2.0 + 3.0 * jax.random.uniform(k3, (K, 1)))
    pts2 = pts + 0.01 * jax.random.normal(k2, (K, 3))

    t = {}

    idx = sample_minimal_sets(jax.random.PRNGKey(5), valid, H, 8)
    r1m, r2m = r1[idx], r2[idx]
    w8 = jnp.ones(idx.shape, jnp.float32)
    t["fit_fast_minimal_sets"] = time_amortized(
        lambda rr: fit_essential_fast(rr, r2m, w8), r1m, inner=256, n=5)
    t["fit_refit_single"] = time_amortized(
        lambda rr: fit_essential_refit(rr, r2, w), r1, inner=256, n=5)
    E = fit_essential_refit(r1, r2, w)
    t["decompose_full_new"] = time_amortized(
        lambda EE: decompose_essential(EE, r1, r2, w)[0], E, inner=512, n=5)
    t["ransac_essential_full"] = time_amortized(
        lambda rr: ransac_essential(jax.random.PRNGKey(5), rr, r2, valid,
                                    n_hyps=H)[0].model, r1, inner=256, n=5)

    C = jnp.eye(3) + 0.1 * jax.random.normal(k1, (3, 3))
    t["procrustes_iters16"] = time_amortized(
        lambda M: procrustes_rotation(M, iters=16), C, inner=512, n=5)
    t["procrustes_iters6"] = time_amortized(
        lambda M: procrustes_rotation(M, iters=6), C, inner=512, n=5)
    t["umeyama_single"] = time_amortized(
        lambda p: umeyama(p, pts2, weights=w)[0], pts, inner=512, n=5)

    t["ransac_rigid_full"] = time_amortized(
        lambda p: ransac_rigid(jax.random.PRNGKey(3), p, pts2, valid,
                               rays_curr=r2, n_hyps=H),
        pts, inner=256, n=5)
    T0 = jnp.eye(4)
    t["refine_6it"] = time_amortized(
        lambda T: refine_pose_bearings(T, pts, r2, w), T0, inner=512, n=5)

    print(json.dumps({
        "device": str(jax.devices()[0]), "K": K, "H": H,
        "stages_us": {n: round(v * 1e6, 1) for n, v in t.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
