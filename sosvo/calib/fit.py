"""Calibration fitting: estimate unified-model parameters from observations.

TPU-native replacement for the reference's calibration toolchain (SURVEY.md
C16: GUM parameters fitted per mirror from chessboard/control-point
observations with scipy least_squares). Here: damped Gauss-Newton on the
reprojection residual with autodiff Jacobians, entirely jitted -- the
parameter vector is tiny (5 intrinsics per view [+ elevation band held
fixed], optional extrinsic z-offset), so the normal equations are solved
densely.

Observations: known 3D control points in the VIEW frame and their measured
pixels. The chessboard-pose-estimation outer loop of a full toolchain is out
of scope here (SURVEY.md C16 scope note); given per-view control points this
recovers the projection parameters to sub-millipixel on clean data.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sosvo.sensor.model import ViewParams, project

# Parameter vector layout: [xi, fx, fy, cx, cy, z_offset]
N_PARAMS = 6


def params_to_vector(v: ViewParams) -> jnp.ndarray:
    return jnp.stack([v.xi, v.fx, v.fy, v.cx, v.cy, v.z_offset])


def vector_to_params(p: jnp.ndarray, template: ViewParams) -> ViewParams:
    return template._replace(xi=p[0], fx=p[1], fy=p[2], cx=p[3], cy=p[4],
                             z_offset=p[5])


class CalibResult(NamedTuple):
    view: ViewParams
    rms_px: jnp.ndarray     # () residual RMS in pixels
    rms0_px: jnp.ndarray    # () initial RMS
    accepted: jnp.ndarray   # (iters,) LM acceptance trace


def _residuals(p: jnp.ndarray, template: ViewParams, pts_view: jnp.ndarray,
               uv_obs: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    view = vector_to_params(p, template)
    # The z_offset shifts the effective viewpoint along the axis.
    uv, _ = project(view, pts_view - jnp.array([0.0, 0.0, 1.0]) * (p[5] - template.z_offset))
    return ((uv - uv_obs) * w[:, None]).reshape(-1)


def fit_view(
    init: ViewParams,
    pts_view: jnp.ndarray,   # (N, 3) control points in the view frame
    uv_obs: jnp.ndarray,     # (N, 2) measured pixels
    weights: jnp.ndarray | None = None,
    iters: int = 20,
    lam0: float = 1e-2,
    fit_z_offset: bool = False,
) -> CalibResult:
    """LM-fit one view's unified-model parameters to control points."""
    n = pts_view.shape[0]
    w = jnp.ones((n,), jnp.float32) if weights is None else weights
    p0 = params_to_vector(init)
    wsum = jnp.maximum(jnp.sum(w > 0), 1)

    # Mask: which parameters move (z_offset only when requested).
    move = jnp.array([1.0, 1.0, 1.0, 1.0, 1.0, 1.0 if fit_z_offset else 0.0])

    def rms(p):
        r = _residuals(p, init, pts_view, uv_obs, w).reshape(-1, 2)
        return jnp.sqrt(jnp.sum(r * r) / wsum)

    def body(carry, _):
        p, lam, cost = carry
        r = _residuals(p, init, pts_view, uv_obs, w)
        J = jax.jacfwd(_residuals)(p, init, pts_view, uv_obs, w)   # (2N, 6)
        J = J * move[None, :]
        H = J.T @ J + lam * jnp.eye(N_PARAMS)
        g = J.T @ r
        cand = p - jnp.linalg.solve(H, g) * move
        cand_cost = rms(cand)
        accept = cand_cost < cost
        p_next = jnp.where(accept, cand, p)
        lam_next = jnp.clip(jnp.where(accept, lam / 3.0, lam * 9.0), 1e-10, 1e6)
        return (p_next, lam_next, jnp.where(accept, cand_cost, cost)), accept

    cost0 = rms(p0)
    (p_fin, _, cost_fin), accepted = jax.lax.scan(
        body, (p0, jnp.asarray(lam0, jnp.float32), cost0), None, length=iters)
    return CalibResult(view=vector_to_params(p_fin, init), rms_px=cost_fin,
                       rms0_px=cost0, accepted=accepted)
