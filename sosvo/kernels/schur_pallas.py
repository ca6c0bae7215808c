"""Fused Pallas TPU kernel for the BA Schur reduction (hot loop C13).

The second hot loop named by BASELINE.json:5 ("Pallas kernels for the ...
Jacobian/Schur hot loops"). Computes, in ONE streaming pass over landmark
tiles (grid axis = landmark tiles, VMEM accumulators live across grid steps):

    H_ll_inv[l] = (H_ll[l] + lam I)^-1          (closed-form 3x3 adjugate)
    A[l]        = H_cl[:, l] @ H_ll_inv[l]
    S_off      += sum_l A[l] H_cl[:, l]^T       ((6W, 6W) accumulator)
    b_sub      += sum_l A[l] b_l[l]

so the intermediate A (same size as H_cl) never round-trips HBM and the 3x3
inversions fuse with the products.

LAYOUT (the part Mosaic actually cares about): everything on-chip is 2D
"component planes". A (L, 6W, 3) or (L, 3, 3) block pads its minor dims to
the (8, 128) tile -- 3 -> 8 sublanes and 30 -> 128 lanes -- which blew the
16 MB VMEM budget at L = 4096. Instead the coupling blocks travel as three
(L, 6W) planes H_k = H_cl[:, :, k], the landmark Hessians as one (L, 9)
component array, and b_l as (L, 3):

    inv9      : componentwise closed-form 3x3 inverse on (L, 9) columns (VPU)
    A_k       = sum_m inv9[:, 3k+m] * H_m            (VPU broadcasts, no pad)
    S_off    += sum_k A_k^T H_k                      (three (TL,6W)^T (TL,6W)
                                                      single-contraction MXU
                                                      matmuls)
    b_sub    += sum_k A_k^T b_l[:, k]

The caller assembles S = diag(H_cc) - S_off, b_red = b_c - b_sub exactly as
the XLA path (`sosvo/backend/schur.py:reduce_camera_system`), which remains
the correctness reference (tests/test_schur_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_L = 512


def _inv9(h9: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Componentwise damped 3x3 inverse: (..., 9) row-major -> (..., 9)."""
    a = h9[..., 0] + lam
    b = h9[..., 1]
    c = h9[..., 2]
    d = h9[..., 3]
    e = h9[..., 4] + lam
    f = h9[..., 5]
    g = h9[..., 6]
    h = h9[..., 7]
    i = h9[..., 8] + lam
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    return jnp.stack([
        A, -(b * i - c * h), b * f - c * e,
        B, a * i - c * g, -(a * f - c * d),
        C, -(a * h - b * g), a * e - b * d,
    ], axis=-1) * inv_det[..., None]


def _schur_kernel(h0_ref, h1_ref, h2_ref, hll9_ref, bl_ref, lam_ref,
                  soff_ref, bsub_ref, hllinv_ref):
    """One landmark tile: invert (VPU), couple (VPU), contract (MXU), accumulate."""
    t = pl.program_id(0)

    H = (h0_ref[:], h1_ref[:], h2_ref[:])   # 3 x (TILE_L, 6W)
    h9 = hll9_ref[:]                        # (TILE_L, 9)
    bl = bl_ref[:]                          # (TILE_L, 3)
    lam = lam_ref[0, 0]

    inv9 = _inv9(h9, lam)                   # (TILE_L, 9)
    hllinv_ref[:] = inv9

    @pl.when(t == 0)
    def _():
        soff_ref[:] = jnp.zeros_like(soff_ref)
        bsub_ref[:] = jnp.zeros_like(bsub_ref)

    s_acc = jnp.zeros_like(soff_ref)
    b_acc = jnp.zeros_like(bsub_ref)
    for k in range(3):
        # A_k = sum_m inv[3k+m] * H_m -- pure VPU broadcast-multiply-add.
        A_k = (inv9[:, 3 * k + 0][:, None] * H[0]
               + inv9[:, 3 * k + 1][:, None] * H[1]
               + inv9[:, 3 * k + 2][:, None] * H[2])     # (TILE_L, 6W)
        s_acc = s_acc + jax.lax.dot_general(
            A_k, H[k],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (6W, 6W)
        b_acc = b_acc + jnp.sum(A_k * bl[:, k][:, None], axis=0, keepdims=True).T

    soff_ref[:] += s_acc
    bsub_ref[:] += b_acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_reduce_pallas(
    H_planes: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],  # 3 x (L, 6W)
    H_ll9: jnp.ndarray,     # (L, 9) row-major UNDAMPED landmark blocks
    b_l: jnp.ndarray,       # (L, 3)
    lam: jnp.ndarray | float,
    interpret: bool = False,
):
    """Fused Schur reduction pieces: (S_off (6W, 6W), b_sub (6W,), inv9 (L, 9)).

    The caller forms S = diag-blocks(H_cc) - S_off and b_red = b_c - b_sub.
    L must be a multiple of TILE_L (pad with zero planes/b rows and identity
    H_ll9 rows -- zero coupling contributes nothing).
    """
    L, sixW = H_planes[0].shape
    assert L % TILE_L == 0, f"L={L} must be a multiple of {TILE_L}"
    lam_arr = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    grid = (L // TILE_L,)

    tile = lambda w: pl.BlockSpec((TILE_L, w), lambda t: (t, 0),
                                  memory_space=pltpu.VMEM)
    acc = lambda r, c: pl.BlockSpec((r, c), lambda t: (0, 0),
                                    memory_space=pltpu.VMEM)
    s_off, b_sub, inv9 = pl.pallas_call(
        _schur_kernel,
        grid=grid,
        in_specs=[
            tile(sixW), tile(sixW), tile(sixW),
            tile(9), tile(3),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(acc(sixW, sixW), acc(sixW, 1), tile(9)),
        out_shape=(
            jax.ShapeDtypeStruct((sixW, sixW), jnp.float32),
            jax.ShapeDtypeStruct((sixW, 1), jnp.float32),
            jax.ShapeDtypeStruct((L, 9), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * (9 * sixW + 3 * sixW * sixW),
            bytes_accessed=L * (3 * sixW + 9 + 3) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(H_planes[0], H_planes[1], H_planes[2], H_ll9, b_l, lam_arr)
    return s_off, b_sub[:, 0], inv9


def reduce_camera_system_pallas(H_cc, H_cl, H_ll, b_c, b_l, lam,
                                interpret: bool = False,
                                damp_H_cc: bool = True,
                                axis_name: str | None = None):
    """Drop-in fused variant of `sosvo.backend.schur.reduce_camera_system`.

    Takes the UNDAMPED H_ll plus lam (the kernel fuses the damping +
    inversion); pads the landmark axis to TILE_L internally. Returns
    (S, b_red, H_ll_inv) with H_ll_inv as (L, 3, 3) for back-substitution.

    `damp_H_cc=False` when the caller already damped/gauged H_cc (the BA
    LM loop does); lam then only damps the landmark blocks in-kernel.

    With `axis_name` (inside shard_map, landmark axis sharded -- SURVEY.md
    P2-TP), the kernel computes THIS shard's partial (S_off, b_sub) and the
    partials are psummed before assembly with the already-global (H_cc, b_c)
    -- same contraction-then-reduce structure as the XLA path
    (`sosvo/backend/schur.py:reduce_camera_system`), so distributed BA can
    run the fused kernel per shard (BASELINE.json:5 "distributed BA via
    Schur-complement reduction ... over jax.lax collectives").
    """
    W = H_cc.shape[0]
    L = H_ll.shape[0]
    Lp = ((L + TILE_L - 1) // TILE_L) * TILE_L
    # Component planes: H_k[l, w*6+i] = H_cl[w, l, i, k].
    H_lm = jnp.transpose(H_cl, (1, 0, 2, 3)).reshape(L, W * 6, 3)
    planes = [H_lm[:, :, k] for k in range(3)]
    H_ll9 = H_ll.reshape(L, 9)
    if Lp != L:
        pad = Lp - L
        planes = [jnp.concatenate([p, jnp.zeros((pad, W * 6), p.dtype)])
                  for p in planes]
        eye9 = jnp.tile(jnp.eye(3, dtype=H_ll.dtype).reshape(1, 9), (pad, 1))
        H_ll9 = jnp.concatenate([H_ll9, eye9])
        b_l = jnp.concatenate([b_l, jnp.zeros((pad, 3), b_l.dtype)])

    s_off, b_sub, inv9 = schur_reduce_pallas(tuple(planes), H_ll9, b_l, lam,
                                             interpret=interpret)
    if axis_name is not None:
        s_off = jax.lax.psum(s_off, axis_name)
        b_sub = jax.lax.psum(b_sub, axis_name)
    S_off = s_off.reshape(W, 6, W, 6).transpose(0, 2, 1, 3)
    eye_w = jnp.eye(W, dtype=H_cc.dtype)
    eye6 = jnp.eye(6, dtype=H_cc.dtype)
    H_cc_eff = H_cc + lam * eye6[None] if damp_H_cc else H_cc
    S = eye_w[:, :, None, None] * H_cc_eff[:, None] - S_off
    b_red = b_c - b_sub.reshape(W, 6)
    return S, b_red, inv9[:L].reshape(L, 3, 3)