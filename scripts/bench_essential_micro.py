#!/usr/bin/env python
"""Micro-dissection of the ransac_essential hot spots on the live backend.

Times the individual primitives inside the hypothesis fit (M build, 9x9
Cholesky, triangular solves -- library vs hand-unrolled) and the essential
decompose (candidate extraction vs cheirality support), so the rebuild of the
phase is driven by measured numbers (VERDICT r3 item 1).
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


def chol9_unrolled(M):
    """Batched 9x9 Cholesky, fully unrolled (no library loop kernels)."""
    n = 9
    cols = []
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    zero = jnp.zeros_like(M[..., 0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
            for i in range(n)]
    return jnp.stack(rows, axis=-2)


def solve_chol9_unrolled(L, b):
    """(L L^T) x = b by unrolled forward+back substitution; b: (..., 9)."""
    n = 9
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[k]
        y[i] = s / L[..., i, i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--hyps", type=int, default=512)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from sosvo.geometry.align import procrustes_rotation
    from sosvo.geometry.essential import (
        decompose_essential, essential_rows, fit_essential_fast)
    from sosvo.utils.profiling import time_amortized

    K, H = args.k, args.hyps
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    r1 = jax.random.normal(k1, (K, 3))
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = r1 + 0.05 * jax.random.normal(k2, (K, 3))
    r2 = r2 / jnp.linalg.norm(r2, axis=-1, keepdims=True)
    w = jnp.ones((K,), jnp.float32)
    w8 = (jax.random.uniform(k3, (H, K)) < (8.0 / K)).astype(jnp.float32)

    t = {}

    # --- hypothesis normal-matrix build ---
    def m_einsum(rr):
        a = essential_rows(jnp.broadcast_to(rr, (H, K, 3)),
                           jnp.broadcast_to(r2, (H, K, 3)))
        return jnp.einsum("...ni,...nj->...ij", a * w8[..., None], a)

    t["M_build_einsum_HK"] = time_amortized(m_einsum, r1, inner=256, n=5)

    def m_matmul(rr):
        a = essential_rows(rr, r2)                     # (K, 9) shared rows
        o = (a[:, :, None] * a[:, None, :]).reshape(K, 81)
        return (w8 @ o).reshape(H, 9, 9)               # ONE MXU matmul

    t["M_build_matmul"] = time_amortized(m_matmul, r1, inner=256, n=5)
    M = m_matmul(r1)
    Mn = M / (jnp.trace(M, axis1=-2, axis2=-1)[..., None, None] / 9.0 + 1e-12)
    Ms = Mn + 1e-5 * jnp.eye(9)

    # --- 9x9 factor + solve: library vs unrolled ---
    t["chol9_lib"] = time_amortized(jnp.linalg.cholesky, Ms, inner=256, n=5)
    t["chol9_unrolled"] = time_amortized(chol9_unrolled, Ms, inner=256, n=5)
    L = jnp.linalg.cholesky(Ms)
    v0 = jnp.ones((H, 9, 1)) / 3.0

    def tri_lib(LL):
        y = jax.scipy.linalg.solve_triangular(LL, v0, lower=True)
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(LL, -1, -2), y, lower=False)

    t["tri_solve_pair_lib"] = time_amortized(tri_lib, L, inner=256, n=5)
    t["tri_solve_pair_unrolled"] = time_amortized(
        lambda LL: solve_chol9_unrolled(LL, v0[..., 0]), L, inner=256, n=5)

    # --- full fit: current library path vs unrolled path ---
    t["fit_fast_current"] = time_amortized(
        lambda rr: fit_essential_fast(jnp.broadcast_to(rr, (H, K, 3)),
                                      jnp.broadcast_to(r2, (H, K, 3)), w8),
        r1, inner=256, n=5)

    def fit_unrolled(rr):
        Mh = m_matmul(rr)
        sc = jnp.trace(Mh, axis1=-2, axis2=-1)[..., None, None] / 9.0 + 1e-12
        LL = chol9_unrolled(Mh / sc + 1e-5 * jnp.eye(9))
        v = jnp.ones((H, 9)) / 3.0
        for _ in range(2):
            v = solve_chol9_unrolled(LL, v)
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
        E = v.reshape(H, 3, 3)
        return E / jnp.maximum(jnp.linalg.norm(E, axis=(-2, -1), keepdims=True), 1e-12)

    t["fit_fast_unrolled"] = time_amortized(fit_unrolled, r1, inner=256, n=5)
    # agreement check (up to sign)
    E_a = fit_essential_fast(jnp.broadcast_to(r1, (H, K, 3)),
                             jnp.broadcast_to(r2, (H, K, 3)), w8)
    E_b = fit_unrolled(r1)
    dot = jnp.abs(jnp.sum(E_a.reshape(H, 9) * E_b.reshape(H, 9), axis=-1))
    t["fit_agreement_min_absdot"] = float(jnp.min(dot))

    # --- decompose: candidates vs support ---
    E = E_b[0]

    def cands_head(EE):
        from sosvo.geometry.essential import _inv3x3

        G = EE @ jnp.swapaxes(EE, -1, -2)
        eps = 1e-5 * jnp.trace(G, axis1=-2, axis2=-1)[..., None, None] + 1e-20
        Ginv = _inv3x3(G + eps * jnp.eye(3))
        tt = jnp.array([0.5774, 0.5774, 0.5774])
        for _ in range(3):
            tt = Ginv @ tt
            tt = tt / jnp.maximum(jnp.linalg.norm(tt), 1e-30)
        zero = jnp.zeros_like(tt[0])
        tx = jnp.stack([
            jnp.stack([zero, -tt[2], tt[1]]),
            jnp.stack([tt[2], zero, -tt[0]]),
            jnp.stack([-tt[1], tt[0], zero]),
        ])
        Mm = jnp.swapaxes(tx, -1, -2) @ EE
        return procrustes_rotation(Mm), procrustes_rotation(-Mm), tt

    t["decomp_cands_head"] = time_amortized(
        lambda EE: cands_head(EE)[0], E, inner=512, n=5)

    def cands_svd(EE):
        u, _, vt = jnp.linalg.svd(EE)
        du, dv = jnp.linalg.det(u), jnp.linalg.det(vt)
        u = u * jnp.stack([jnp.ones_like(du), jnp.ones_like(du), du])[None, :]
        vt = vt * jnp.stack([jnp.ones_like(dv), jnp.ones_like(dv), dv])[:, None]
        W = jnp.array([[0., -1., 0.], [1., 0., 0.], [0., 0., 1.]])
        return u @ W @ vt, u @ W.T @ vt, u[:, 2]

    t["decomp_cands_svd"] = time_amortized(
        lambda EE: cands_svd(EE)[0], E, inner=512, n=5)
    t["procrustes_single"] = time_amortized(
        lambda EE: procrustes_rotation(EE), E, inner=512, n=5)

    t["decomp_full_head"] = time_amortized(
        lambda EE: decompose_essential(EE, r1, r2, w)[0], E, inner=512, n=5)

    print(json.dumps({
        "device": str(jax.devices()[0]), "K": K, "H": H,
        "stages_us": {n: (round(v * 1e6, 1) if isinstance(v, float) and n != "fit_agreement_min_absdot" else v)
                      for n, v in t.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
