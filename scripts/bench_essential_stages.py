#!/usr/bin/env python
"""Dissect the ransac_essential phase on the live backend, stage by stage.

The r2->r3 bench regression localized to ransac_essential (1.06 ms of a
1.76 ms frame at HEAD); this times each sub-stage and the r1-era variants
(9x9 eigh refit, SVD decompose) side by side so the regressed stage is
named by measurement, not by guess.

Run:  python scripts/bench_essential_stages.py [--k 512] [--hyps 512]
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

    from sosvo.geometry.essential import (
        decompose_essential, epipolar_residual_angle, epipolar_residual_sin,
        epipolar_residual_sin_hyps, essential_rows, fit_essential_fast,
        fit_essential_refit)
    from sosvo.utils.profiling import time_amortized

    K, H = args.k, args.hyps
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    r1 = jax.random.normal(k1, (K, 3))
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = r1 + 0.05 * jax.random.normal(k2, (K, 3))
    r2 = r2 / jnp.linalg.norm(r2, axis=-1, keepdims=True)
    w = jnp.ones((K,), jnp.float32)
    w8 = jax.random.uniform(k3, (H, K)) < (8.0 / K)
    w8 = w8.astype(jnp.float32)

    t = {}

    # Hypothesis batch fit (H, 9x9 each): unchanged since r1.
    t["fit_fast_H"] = time_amortized(
        lambda r: fit_essential_fast(r[None].repeat(H, 0) * 0 + r1[None], r2[None].repeat(H, 0), w8),
        r1, inner=256, n=5)

    E_h = fit_essential_fast(jnp.broadcast_to(r1, (H, K, 3)),
                             jnp.broadcast_to(r2, (H, K, 3)), w8)

    # Scoring: HEAD's matmul form vs the r1-era vmapped form.
    t["score_hyps_matmul"] = time_amortized(
        lambda rr: epipolar_residual_sin_hyps(E_h, rr, r2), r1, inner=256, n=5)
    t["score_hyps_vmap"] = time_amortized(
        lambda rr: jax.vmap(lambda E: epipolar_residual_sin(E, rr, r2))(E_h),
        r1, inner=256, n=5)

    # Refit: HEAD Rayleigh-Ritz vs r1 9x9 eigh.
    t["refit_rr"] = time_amortized(
        lambda rr: fit_essential_refit(rr, r2, w), r1, inner=256, n=5)

    def fit_eigh(rays1, rays2, weights):
        a = essential_rows(rays1, rays2)
        ata = jnp.einsum("...ni,...nj->...ij", a * weights[..., None], a)
        _, vecs = jnp.linalg.eigh(ata)
        e = vecs[..., :, 0]
        E = e.reshape(e.shape[:-1] + (3, 3))
        return E / jnp.maximum(jnp.linalg.norm(E, axis=(-2, -1), keepdims=True), 1e-12)

    t["refit_eigh"] = time_amortized(
        lambda rr: fit_eigh(rr, r2, w), r1, inner=256, n=5)

    E = fit_essential_refit(r1, r2, w)

    t["residual_angle"] = time_amortized(
        lambda rr: epipolar_residual_angle(E, rr, r2), r1, inner=256, n=5)

    # Decompose: HEAD procrustes/QCP vs r1 SVD.
    t["decompose_head"] = time_amortized(
        lambda EE: decompose_essential(EE, r1, r2, w)[0], E, inner=256, n=5)

    def decompose_svd(E, rays1, rays2, weights):
        u, _, vt = jnp.linalg.svd(E)
        du = jnp.linalg.det(u)
        dv = jnp.linalg.det(vt)
        u = u * jnp.stack([jnp.ones_like(du), jnp.ones_like(du), du], axis=-1)[..., None, :]
        vt = vt * jnp.stack([jnp.ones_like(dv), jnp.ones_like(dv), dv], axis=-1)[..., :, None]
        W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
        Ra = u @ W @ vt
        tt = u[..., :, 2]
        return Ra, tt

    t["decompose_svd_r1"] = time_amortized(
        lambda EE: decompose_svd(EE, r1, r2, w)[0], E, inner=256, n=5)

    # The whole HEAD ransac_essential for reference.
    from sosvo.geometry.ransac import ransac_essential
    t["ransac_essential_full"] = time_amortized(
        lambda rr: ransac_essential(jax.random.PRNGKey(5), rr, r2,
                                    jnp.ones((K,), bool), n_hyps=H)[0].model,
        r1, inner=256, n=5)

    print(json.dumps({
        "device": str(jax.devices()[0]), "K": K, "H": H,
        "stages_us": {n: round(v * 1e6, 1) for n, v in t.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
