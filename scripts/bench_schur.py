#!/usr/bin/env python
"""Schur-reduction microbench: Pallas fused kernel vs XLA path, W=5, L=4096.

High-REPS amortized protocol: round 1 measured at 50 reps, where the Pallas
time (558 us x 50 = 28 ms) was actually the ~26 ms tunnel RPC floor, not the
kernel. REPS=2000 puts real device time >= 10x the RPC latency.
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

from sosvo.backend.schur import inv3x3, reduce_camera_system
from sosvo.kernels.schur_pallas import reduce_camera_system_pallas

REPS = 2000
W, L = 5, 4096


def timed(fn, *args):
    block = jax.jit(fn)
    jax.block_until_ready(block(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(block(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / REPS * 1e6  # us


def main():
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    J = jax.random.normal(k[0], (W, L, 6, 6)) * 0.1
    Jl = jax.random.normal(k[1], (W, L, 6, 3)) * 0.1
    H_cc = jnp.einsum("wlri,wlrj->wij", J, J)
    H_cl = jnp.einsum("wlri,wlrj->wlij", J, Jl)
    H_ll = jnp.einsum("wlri,wlrj->lij", Jl, Jl) + 0.1 * jnp.eye(3)[None]
    b_c = jax.random.normal(k[2], (W, 6))
    b_l = jax.random.normal(k[3], (L, 3))
    lam = jnp.float32(1e-3)
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)

    # Loop-carried dep: lam is nudged by a vanishing function of the output.
    def xla_loop(lam0):
        def body(_, lam):
            H_ll_inv = inv3x3(H_ll + lam * eye3[None])
            S, b = reduce_camera_system(H_cc + lam * eye6[None], H_cl,
                                        H_ll_inv, b_c, b_l)
            return lam + jnp.sum(b) * jnp.float32(1e-38)
        return jax.lax.fori_loop(0, REPS, body, lam0)

    def pallas_loop(lam0):
        def body(_, lam):
            S, b, inv = reduce_camera_system_pallas(H_cc, H_cl, H_ll, b_c,
                                                    b_l, lam)
            return lam + jnp.sum(b) * jnp.float32(1e-38)
        return jax.lax.fori_loop(0, REPS, body, lam0)

    t_xla = timed(xla_loop, lam)
    t_pal = timed(pallas_loop, lam)
    print(json.dumps({
        "W": W, "L": L, "reps": REPS,
        "xla_us": round(t_xla, 1), "pallas_us": round(t_pal, 1),
        "speedup": round(t_xla / t_pal, 2),
    }))


if __name__ == "__main__":
    main()
