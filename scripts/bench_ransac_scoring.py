#!/usr/bin/env python
"""RANSAC hypothesis-scoring microbench: vmapped elementwise vs MXU matmul.

Amortized in-device (bench.py protocol: ~26 ms RPC per dispatch on the
remote-TPU tunnel). Decides whether `_bearing_neg_cos_hyps` /
`epipolar_residual_sin_hyps` (bilinear/quadratic-form expansion onto the MXU)
stay on the production path (BASELINE.md kernel table).
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

from sosvo.geom.lie import se3_exp
from sosvo.geometry.essential import epipolar_residual_sin, epipolar_residual_sin_hyps
from sosvo.geometry.ransac import _bearing_neg_cos, _bearing_neg_cos_hyps

REPS = 2000


def time_loop(body, carry0):
    loop = jax.jit(lambda c: jax.lax.fori_loop(0, REPS, lambda _, c: body(c), c))
    jax.block_until_ready(loop(carry0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(carry0))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / REPS


def bench(h: int, k: int) -> dict:
    key = jax.random.PRNGKey(0)
    kH, kP, kR, k1, k2, kE = jax.random.split(key, 6)
    T_h = se3_exp(0.3 * jax.random.normal(kH, (h, 6)))
    pts = 4.0 * jax.random.normal(kP, (k, 3))
    rays = jax.random.normal(kR, (k, 3))
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    r1 = jax.random.normal(k1, (k, 3))
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = jax.random.normal(k2, (k, 3))
    r2 = r2 / jnp.linalg.norm(r2, axis=-1, keepdims=True)
    E_h = jax.random.normal(kE, (h, 3, 3))
    E_h = E_h / jnp.linalg.norm(E_h, axis=(-2, -1), keepdims=True)

    # loop-carried dependency: fold a vanishing residual sum into the points
    def rigid_vmap(p):
        res = jax.vmap(lambda T: _bearing_neg_cos(T, p, rays))(T_h)
        return p + jnp.sum(res) * jnp.float32(1e-38)

    def rigid_mxu(p):
        res = _bearing_neg_cos_hyps(T_h, p, rays)
        return p + jnp.sum(res) * jnp.float32(1e-38)

    def ess_vmap(a):
        res = jax.vmap(lambda E: epipolar_residual_sin(E, a, r2))(E_h)
        return a + jnp.sum(res) * jnp.float32(1e-38)

    def ess_mxu(a):
        res = epipolar_residual_sin_hyps(E_h, a, r2)
        return a + jnp.sum(res) * jnp.float32(1e-38)

    out = {"H": h, "K": k}
    for name, body, c0 in [("rigid_vmap", rigid_vmap, pts), ("rigid_mxu", rigid_mxu, pts),
                           ("ess_vmap", ess_vmap, r1), ("ess_mxu", ess_mxu, r1)]:
        out[name + "_us"] = round(time_loop(body, c0) * 1e6, 1)
    out["rigid_speedup"] = round(out["rigid_vmap_us"] / out["rigid_mxu_us"], 2)
    out["ess_speedup"] = round(out["ess_vmap_us"] / out["ess_mxu_us"], 2)
    return out


def main():
    print(json.dumps({
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0].device_kind),
        "rows": [bench(512, 512), bench(1024, 2048)],
    }, indent=2))


if __name__ == "__main__":
    main()
