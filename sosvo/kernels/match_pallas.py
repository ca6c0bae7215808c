"""Fused Pallas TPU kernel for Hamming descriptor matching (hot loop C7).

STATUS: RETIRED from the production path by measurement (round 2). With
properly amortized timing (2000 in-device reps; the round-1 "546 vs 591 us"
numbers at 50 reps were dominated by the ~26 ms remote-dispatch RPC floor),
the XLA matcher runs 15.8 us at K=512 and 31.6 us at K=2048 on v5e, vs 22.2 /
111.3 us for this kernel (0.71x / 0.28x) -- XLA's fused matmul+reduce over a
K x K f32 matrix that fits comfortably in VMEM/caches at these sizes beats
streaming tiles with in-kernel scalar-indexed RMW. The kernel stays in-tree
as a bit-identical alternative (tests/test_match_pallas.py) and as the
starting point if feature counts ever grow past K ~ 8k where the O(K^2) HBM
matrix would start to matter; `use_pallas_match=False` is the measured
default (BASELINE.md kernel table).

One of the two hot loops BASELINE.json:5 names ("Pallas kernels for the
match/score ... hot loops"). The XLA reference path
(`sosvo/frontend/match.py`) materializes the full (KA, KB) distance matrix;
this kernel streams column tiles through VMEM flash-attention style and
reduces on the fly, so HBM traffic drops from O(KA*KB) to
O((KA+KB) * 256 bits) -- the descriptors themselves.

Per column tile (128 B-features):
  1. distance tile on the MXU: d = (NBITS - a_pm1 @ b_pm1^T) / 2, where
     a_pm1/b_pm1 are the 256-bit descriptors unpacked to +/-1 bf16 (exact in
     f32 accumulation for NBITS <= 256);
  2. the stereo azimuth-band penalty and validity masking are fused
     elementwise on the tile (the (KA, KB) penalty matrix is never built);
  3. running per-row best/second-best/argmin and per-column argmin are
     updated in registers/VMEM.

Outputs feed the identical ratio-test + cross-check epilogue as the XLA
path, so kernel equivalence is testable bit-for-bit (SURVEY.md section 4.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sosvo.frontend.match import BIG, NBITS, MatchResult, unpack_bits_pm1

TILE = 512     # column (B-feature) tile, streamed (small tiles serialize:
               # at 128 the kernel ran 64 micro-steps and lost to XLA)
TILE_A = 1024  # MAX row (A-feature) tile, one grid step each; the actual row
               # tile adapts to the workload (min(TILE_A, padded KA)) so a
               # K=512 matcher is not padded 2x in rows before it starts


def _match_kernel(band_ref, a_ref, b_ref, aza_ref, azb_ref, va_ref, vb_ref,
                  dbest_ref, dsecond_ref, ibest_ref, colmin_ref,
                  colval_ref):
    """Row-tiled grid x streamed column tiles; reduce stats on the fly.

    Grid: (KA / TILE_A,) sequential row tiles -- the full A never sits in
    VMEM (at K >= 2048 that would blow the 16 MB budget). Column-argmin
    state spans row tiles, so it lives in VMEM scratch that persists across
    grid steps (colval_ref) with the int index as an accumulated output.

    Refs:
      band_ref: (1, 1) SMEM f32 -- azimuth band half-width (rad); <= 0 means
        no band constraint (temporal matching).
      a_ref: (TILE_A, NBITS) bf16 +/-1 unpacked descriptors (this row tile).
      b_ref: (KB, NBITS) bf16 (full, stays resident).
      aza_ref: (TILE_A, 1) f32 azimuths; azb_ref: (KB, 1).
      va_ref: (TILE_A, 1) f32 validity (1/0); vb_ref: (KB, 1).
      dbest_ref, dsecond_ref: (TILE_A, 1) f32 outputs (row-tile slices).
      ibest_ref: (TILE_A, 1) int32 output -- argmin_b of each row.
      colmin_ref: (KB, 1) int32 output -- argmin_a of each column (global).
      colval_ref: (KB, 1) f32 scratch -- running column minima.
    """
    i = pl.program_id(0)
    ka_t = a_ref.shape[0]
    kb = b_ref.shape[0]
    n_tiles = kb // TILE
    band = band_ref[0, 0]
    big = float(BIG)  # python float: jnp constants cannot be captured by kernels
    two_pi = 2.0 * float(jnp.pi)
    row_base = i * ka_t

    @pl.when(i == 0)
    def _():
        colval_ref[:] = jnp.full_like(colval_ref, jnp.inf)
        colmin_ref[:] = jnp.zeros_like(colmin_ref)

    a = a_ref[:]                               # (TILE_A, NBITS) bf16
    az_a = aza_ref[:]                          # (TILE_A, 1)
    pen_a = (1.0 - va_ref[:]) * big            # (TILE_A, 1)

    def body(j, carry):
        dbest, dsecond, ibest = carry
        b_t = b_ref[pl.ds(j * TILE, TILE), :]  # (TILE, NBITS)
        dot = jax.lax.dot_general(
            a, b_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # DEFAULT, explicitly: the package sets jax_default_matmul_precision
            # to "highest", whose fp32 contract precision Mosaic rejects for
            # bf16 operands ("Bad lhs type"). bf16 x bf16 -> f32 accumulation
            # is exact for +/-1 vectors of length <= 256, so DEFAULT is safe.
            precision=jax.lax.Precision.DEFAULT,
        )                                      # (TILE_A, TILE)
        d = (NBITS - dot) * 0.5

        # Fused penalties: invalid rows/cols + optional azimuth band.
        az_b = azb_ref[pl.ds(j * TILE, TILE), :]            # (TILE, 1)
        pen_b = (1.0 - vb_ref[pl.ds(j * TILE, TILE), :]) * big
        d = d + pen_a + pen_b.reshape(1, TILE)
        diff = az_a - az_b.reshape(1, TILE)                 # (TILE_A, TILE)
        # Circular band check without divide/round: azimuths live in
        # [-pi, pi), so the wrapped distance is within band iff one of
        # {|d|, |d - 2pi|, |d + 2pi|} is -- three compares on the VPU.
        in_band = ((jnp.abs(diff) <= band)
                   | (jnp.abs(diff - two_pi) <= band)
                   | (jnp.abs(diff + two_pi) <= band))
        d = d + jnp.where(in_band | (band <= 0.0), 0.0, big)

        # Per-column running argmin across row tiles (scratch + output RMW).
        cmin = jnp.min(d, axis=0).reshape(TILE, 1)          # (TILE, 1)
        cidx = (jnp.argmin(d, axis=0).astype(jnp.int32) + row_base).reshape(TILE, 1)
        cur_val = colval_ref[pl.ds(j * TILE, TILE), :]
        cur_idx = colmin_ref[pl.ds(j * TILE, TILE), :]
        better = cmin < cur_val
        colval_ref[pl.ds(j * TILE, TILE), :] = jnp.where(better, cmin, cur_val)
        colmin_ref[pl.ds(j * TILE, TILE), :] = jnp.where(better, cidx, cur_idx)

        # Per-row best/second-best merge with the running state.
        m1 = jnp.min(d, axis=1, keepdims=True)              # (TILE_A, 1)
        i1 = jnp.argmin(d, axis=1).astype(jnp.int32).reshape(ka_t, 1) + j * TILE
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (ka_t, TILE), 1)
        d_masked = jnp.where(col_ids == (i1 - j * TILE), jnp.inf, d)
        m2 = jnp.min(d_masked, axis=1, keepdims=True)       # tile second-best

        new_best = jnp.minimum(dbest, m1)
        new_ibest = jnp.where(m1 < dbest, i1, ibest)
        new_second = jnp.minimum(jnp.minimum(dsecond, m2), jnp.maximum(dbest, m1))
        return new_best, new_second, new_ibest

    init = (
        jnp.full((ka_t, 1), jnp.inf, jnp.float32),
        jnp.full((ka_t, 1), jnp.inf, jnp.float32),
        jnp.zeros((ka_t, 1), jnp.int32),
    )
    dbest, dsecond, ibest = jax.lax.fori_loop(0, n_tiles, body, init)
    dbest_ref[:] = dbest
    dsecond_ref[:] = dsecond
    ibest_ref[:] = ibest


def _pad_to(x: jnp.ndarray, n: int, fill) -> jnp.ndarray:
    k = x.shape[0]
    if k == n:
        return x
    pad = jnp.full((n - k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def match_stats_pallas(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    az_a: jnp.ndarray | None = None,
    az_b: jnp.ndarray | None = None,
    band: float | jnp.ndarray = 0.0,
    interpret: bool = False,
):
    """Fused matcher statistics: (d_best, d_second, idx_b, col_argmin).

    Semantics identical to reducing the XLA path's penalized distance matrix
    (`sosvo/frontend/match.py`): invalid rows/cols and out-of-band pairs get
    +BIG. `band` <= 0 disables the azimuth-band constraint.
    """
    ka, kb = desc_a.shape[0], desc_b.shape[0]
    # Row tile: the workload size itself when it fits in one grid step (padded
    # to the bf16 sublane multiple), else TILE_A-row steps.
    tile_a = min(TILE_A, pl.cdiv(ka, 16) * 16)
    ka_p = pl.cdiv(ka, tile_a) * tile_a
    kb_p = pl.cdiv(kb, TILE) * TILE

    a = _pad_to(unpack_bits_pm1(desc_a), ka_p, jnp.bfloat16(0))
    b = _pad_to(unpack_bits_pm1(desc_b), kb_p, jnp.bfloat16(0))
    va = _pad_to(valid_a.astype(jnp.float32)[:, None], ka_p, 0.0)
    vb = _pad_to(valid_b.astype(jnp.float32)[:, None], kb_p, 0.0)
    aza = jnp.zeros((ka, 1), jnp.float32) if az_a is None else az_a.astype(jnp.float32)[:, None]
    azb = jnp.zeros((kb, 1), jnp.float32) if az_b is None else az_b.astype(jnp.float32)[:, None]
    aza = _pad_to(aza, ka_p, 0.0)
    azb = _pad_to(azb, kb_p, 0.0)
    band_arr = jnp.asarray(band, jnp.float32).reshape(1, 1)

    out_shape = (
        jax.ShapeDtypeStruct((ka_p, 1), jnp.float32),   # d_best
        jax.ShapeDtypeStruct((ka_p, 1), jnp.float32),   # d_second
        jax.ShapeDtypeStruct((ka_p, 1), jnp.int32),     # idx_b
        jax.ShapeDtypeStruct((kb_p, 1), jnp.int32),     # col_argmin
    )
    row = lambda width: pl.BlockSpec((tile_a, width), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    whole = lambda n, w: pl.BlockSpec((n, w), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    dbest, dsecond, ibest, colmin = pl.pallas_call(
        _match_kernel,
        grid=(ka_p // tile_a,),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # band scalar
            row(NBITS),                                 # a (row tile)
            whole(kb_p, NBITS),                         # b (resident)
            row(1), whole(kb_p, 1),                     # azimuths
            row(1), whole(kb_p, 1),                     # validity
        ],
        out_specs=(row(1), row(1), row(1), whole(kb_p, 1)),
        scratch_shapes=[pltpu.VMEM((kb_p, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * ka_p * kb_p * NBITS,
            bytes_accessed=(ka_p + kb_p) * (NBITS // 8 + 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(band_arr, a, b, aza, azb, va, vb)
    return (dbest[:ka, 0], dsecond[:ka, 0], ibest[:ka, 0], colmin[:kb, 0])


def match_pallas(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    max_distance: float = 64.0,
    ratio: float = 0.8,
    cross_check: bool = True,
    az_a: jnp.ndarray | None = None,
    az_b: jnp.ndarray | None = None,
    band: float = 0.0,
    interpret: bool = False,
) -> MatchResult:
    """Drop-in fused replacement for `sosvo.frontend.match.match`.

    The stereo column-band constraint is expressed via (az_a, az_b, band)
    instead of a dense penalty matrix; everything else matches the XLA
    matcher's semantics (ratio test with strict inequality, cross-check,
    distance threshold, validity masks).
    """
    d_best, d_second, idx_b, col_argmin = match_stats_pallas(
        desc_a, desc_b, valid_a, valid_b, az_a, az_b, band, interpret=interpret
    )
    ka = desc_a.shape[0]
    ok = valid_a & (d_best <= max_distance) & (d_best < ratio * d_second)
    if cross_check:
        row_ids = jnp.arange(ka, dtype=jnp.int32)
        ok = ok & (col_argmin[idx_b] == row_ids)
    return MatchResult(idx_b=idx_b, dist=d_best, valid=ok)
