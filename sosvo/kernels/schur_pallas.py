"""Fused Pallas TPU kernel for the BA Schur reduction (hot loop C13).

The second hot loop named by BASELINE.json:5 ("Pallas kernels for the ...
Jacobian/Schur hot loops"). Computes, in ONE streaming pass over landmark
tiles (grid axis = landmark tiles, VMEM accumulators live across grid steps):

    H_ll_inv[l] = (H_ll[l] + lam I)^-1          (closed-form 3x3 adjugate)
    A[l]        = H_cl[:, l] @ H_ll_inv[l]
    S_off      += sum_l A[l] H_cl[:, l]^T       ((6W, 6W) accumulator)
    b_sub      += sum_l A[l] b_l[l]

so the intermediate A (same size as H_cl) never round-trips HBM and the 3x3
inversions fuse with the products. The caller assembles
S = diag(H_cc) - S_off, b_red = b_c - b_sub exactly as the XLA path
(`sosvo/backend/schur.py:reduce_camera_system`), which remains the
correctness reference (equivalence tested in tests/test_schur_pallas.py).

Layout: H_cl is passed LANDMARK-MAJOR as (L, 6W, 3) -- landmarks are the
streaming axis on-chip and the sharding axis across chips, so landmark-major
is the canonical layout everywhere in the BA stack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_L = 256


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse via adjugate ((..., 3, 3))."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def _schur_kernel(hclT_ref, hll_ref, bl_ref, lam_ref,
                  soff_ref, bsub_ref, hllinv_ref):
    """One landmark tile: invert, couple, accumulate.

    Grid: (L / TILE_L,) sequential; soff_ref/bsub_ref use a constant index
    map so the same (6W, 6W) / (6W, 1) accumulator block persists and
    accumulates across grid steps.

    All contractions are single-dim matmuls (Mosaic's tpu.matmul does not
    support multiple contracting dims): with the TRANSPOSED coupling layout
    hclT (l, 3, 6W), merging (l, 3) -> one major axis turns both the Schur
    product and the gradient subtraction into plain (6W x 3TL) matmuls.
    """
    t = pl.program_id(0)

    hclT = hclT_ref[:]          # (TILE_L, 3, 6W)
    hll = hll_ref[:]            # (TILE_L, 3, 3)
    bl = bl_ref[:]              # (TILE_L, 3)
    lam = lam_ref[0, 0]
    tl, _, sixW = hclT.shape

    eye3 = jnp.eye(3, dtype=hll.dtype)
    hll_inv = _inv3x3(hll + lam * eye3[None])            # (TILE_L, 3, 3)
    hllinv_ref[:] = hll_inv

    # A^T[l] = H_ll_inv[l] @ H_cl[l]^T : batched (3, 3) x (3, 6W).
    # (H_ll_inv is symmetric, so this is A[l] = H_cl[l] H_ll_inv[l], stored
    # transposed -- exactly the layout the next matmul wants.)
    AT = jax.lax.dot_general(
        hll_inv, hclT,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                    # (TILE_L, 3, 6W)

    # S_off += sum_{l,k} A^T[l,k,:]^T hclT[l,k,:] : merge (l, k) -> rows,
    # then a single (3TL, 6W)^T x (3TL, 6W) matmul on the MXU.
    A2 = AT.reshape(tl * 3, sixW)
    H2 = hclT.reshape(tl * 3, sixW)
    s_tile = jax.lax.dot_general(
        A2, H2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (6W, 6W)
    # b_sub contribution: sum_{l,k} AT[l,k,:] bl[l,k]. Mosaic cannot reshape
    # (TL, 3) -> (3TL, 1) (minor-dim change) and rejects matmuls whose lhs
    # has no non-contracting dims, so give bl a trailing singleton, contract
    # k per landmark on the MXU, and reduce the landmark axis on the VPU.
    tmp = jax.lax.dot_general(
        bl[:, :, None], AT,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                    # (TILE_L, 1, 6W)
    b_tile = jnp.sum(tmp[:, 0, :], axis=0, keepdims=True).T   # (6W, 1)

    @pl.when(t == 0)
    def _():
        soff_ref[:] = jnp.zeros_like(soff_ref)
        bsub_ref[:] = jnp.zeros_like(bsub_ref)

    soff_ref[:] += s_tile
    bsub_ref[:] += b_tile


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_reduce_pallas(
    H_clT: jnp.ndarray,     # (L, 3, 6W) TRANSPOSED landmark-major coupling
    H_ll: jnp.ndarray,      # (L, 3, 3) UNDAMPED landmark blocks
    b_l: jnp.ndarray,       # (L, 3)
    lam: jnp.ndarray | float,
    interpret: bool = False,
):
    """Fused Schur reduction pieces: (S_off (6W, 6W), b_sub (6W,), H_ll_inv).

    The caller forms S = diag-blocks(H_cc) - S_off and b_red = b_c - b_sub.
    L must be a multiple of TILE_L (pad with zero blocks: zero H_cl/b_l rows
    contribute nothing; H_ll pads should be identity to keep the inverse
    finite).
    """
    L, _, sixW = H_clT.shape
    assert L % TILE_L == 0, f"L={L} must be a multiple of {TILE_L}"
    lam_arr = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    grid = (L // TILE_L,)

    s_off, b_sub, h_ll_inv = pl.pallas_call(
        _schur_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_L, 3, sixW), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_L, 3, 3), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_L, 3), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((sixW, sixW), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sixW, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_L, 3, 3), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((sixW, sixW), jnp.float32),
            jax.ShapeDtypeStruct((sixW, 1), jnp.float32),
            jax.ShapeDtypeStruct((L, 3, 3), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * (sixW * 9 + sixW * sixW * 3),
            bytes_accessed=L * (sixW * 3 + 9 + 3) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(H_clT, H_ll, b_l, lam_arr)
    return s_off, b_sub[:, 0], h_ll_inv


def reduce_camera_system_pallas(H_cc, H_cl, H_ll, b_c, b_l, lam,
                                interpret: bool = False):
    """Drop-in fused variant of `sosvo.backend.schur.reduce_camera_system`.

    Takes the UNDAMPED H_ll plus lam (the kernel fuses the damping +
    inversion); pads the landmark axis to TILE_L internally.
    """
    W = H_cc.shape[0]
    L = H_ll.shape[0]
    Lp = ((L + TILE_L - 1) // TILE_L) * TILE_L
    # hclT[l, j, w*6+i] = H_cl[w, l, i, j] -- transposed landmark-major.
    H_clT = jnp.transpose(H_cl, (1, 3, 0, 2)).reshape(L, 3, W * 6)
    if Lp != L:
        pad = Lp - L
        H_clT = jnp.concatenate(
            [H_clT, jnp.zeros((pad, 3, W * 6), H_clT.dtype)])
        H_ll = jnp.concatenate(
            [H_ll, jnp.tile(jnp.eye(3, dtype=H_ll.dtype), (pad, 1, 1))])
        b_l = jnp.concatenate([b_l, jnp.zeros((pad, 3), b_l.dtype)])

    s_off, b_sub, h_ll_inv = schur_reduce_pallas(H_clT, H_ll, b_l, lam,
                                                 interpret=interpret)
    S_off = s_off.reshape(W, 6, W, 6).transpose(0, 2, 1, 3)
    eye_w = jnp.eye(W, dtype=H_cc.dtype)
    eye6 = jnp.eye(6, dtype=H_cc.dtype)
    S = eye_w[:, :, None, None] * (H_cc + lam * eye6[None])[:, None] - S_off
    b_red = b_c - b_sub.reshape(W, 6)
    return S, b_red, h_ll_inv[:L]
