"""Nonlinear pose refinement on SE(3), fixed-iteration Gauss-Newton/LM.

TPU-native replacement for the reference's `scipy.optimize.least_squares`
pose refinement (SURVEY.md C12: refine the RANSAC-inlier pose by minimizing
spherical reprojection error [P1]). Idiomatic JAX: lift-solve-retract on the
SE(3) tangent, Jacobians by autodiff (jacfwd over the 6-dim tangent), a fixed
number of damped iterations inside `lax.fori_loop` -- no data-dependent
control flow, jits and vmaps cleanly (e.g. over batched sequences,
BASELINE.json:10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sosvo.backend.schur import solve6x6_spd
from sosvo.geom.lie import se3_exp, transform_points


def bearing_residuals(T: jnp.ndarray, pts_prev: jnp.ndarray, rays_curr: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) spherical reprojection residuals: direction(T X_prev) - ray_curr.

    The unit-vector difference is a well-conditioned small-angle proxy for the
    angular error (|d| = 2 sin(angle/2)) and keeps the residual smooth through
    autodiff (SURVEY.md C12 "spherical reprojection error").
    """
    pred = transform_points(T, pts_prev)
    d = pred / jnp.maximum(jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-9)
    return d - rays_curr


def refine_pose_bearings(
    T_init: jnp.ndarray,
    pts_prev: jnp.ndarray,
    rays_curr: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 6,
    damping: float = 1e-4,
    huber_delta: float = 0.01,
) -> jnp.ndarray:
    """Refine T (curr-from-prev) so that T X_prev aligns with observed rays.

    IRLS with a Huber kernel on the per-point bearing residual norm: the
    previous frame's triangulated points carry depth errors growing ~ depth^2
    over the vertical baseline [P2], which the RANSAC inlier gate cannot
    fully remove; Huber keeps those heavy-tailed points from dragging the
    pose (reference's robust refinement stage, SURVEY.md C12).

    Args:
      T_init: (4, 4) initial relative pose (e.g. RANSAC output).
      pts_prev: (N, 3) triangulated points in the previous rig frame.
      rays_curr: (N, 3) observed unit rays in the current rig frame.
      weights: (N,) weights; zero = ignored slot (mask discipline).
      iters: fixed Gauss-Newton iteration count.
      damping: Levenberg lambda added to the normal equations.
      huber_delta: Huber kernel width on |bearing residual| (~rad).

    Returns:
      (4, 4) refined pose.
    """

    def step(_, T):
        # Closed-form Jacobian (equal to jacfwd of the lifted residual, see
        # tests/test_ba.py): with q = T p, d = q/|q|, left-perturbation
        # q(delta) = q + delta_v + delta_w x q gives
        #   J_k = w_k (I - d d^T)/|q| [ -[q]x | I ]   (tangent = (omega, v)).
        # One (6, 3N) @ (3N, 6) matmul forms the normal equations -- no 6-pass
        # jacfwd re-evaluation of the residual graph per iteration.
        q = transform_points(T, pts_prev)                     # (N, 3)
        nq = jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-9)
        d = q / nq
        r_raw = d - rays_curr
        nrm = jnp.linalg.norm(r_raw, axis=-1)
        huber_w = jnp.sqrt(jnp.where(nrm <= huber_delta, 1.0,
                                     huber_delta / jnp.maximum(nrm, 1e-12)))
        w = weights * huber_w

        eye3 = jnp.eye(3, dtype=T.dtype)
        P = eye3 - d[:, :, None] * d[:, None, :]              # (N, 3, 3)
        zero = jnp.zeros_like(q[:, 0])
        qhat = jnp.stack([
            jnp.stack([zero, -q[:, 2], q[:, 1]], axis=-1),
            jnp.stack([q[:, 2], zero, -q[:, 0]], axis=-1),
            jnp.stack([-q[:, 1], q[:, 0], zero], axis=-1),
        ], axis=-2)                                           # (N, 3, 3)
        B = jnp.concatenate([-(P @ qhat), P], axis=-1) / nq[:, :, None]  # (N, 3, 6)
        Jw = (w[:, None, None] * B).reshape(-1, 6)            # (3N, 6)
        rw = (w[:, None] * r_raw).reshape(-1)                 # (3N,)
        H = Jw.T @ Jw + damping * jnp.eye(6, dtype=T.dtype)
        g = Jw.T @ rw
        delta = -solve6x6_spd(H, g)  # closed form; no LU loop on TPU
        return se3_exp(delta) @ T

    return jax.lax.fori_loop(0, iters, step, T_init)


def refine_pose_points(
    T_init: jnp.ndarray,
    pts_prev: jnp.ndarray,
    pts_curr: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 4,
    damping: float = 1e-4,
    huber_delta: float = 0.05,
) -> jnp.ndarray:
    """Robust (Huber/IRLS) refinement of T on 3D-3D point residuals."""

    def residual_vec(delta, T, w):
        T_d = se3_exp(delta) @ T
        r = transform_points(T_d, pts_prev) - pts_curr
        return (r * w[:, None]).reshape(-1)

    def step(_, T):
        zero = jnp.zeros(6, dtype=T.dtype)
        r_raw = transform_points(T, pts_prev) - pts_curr
        nrm = jnp.linalg.norm(r_raw, axis=-1)
        huber_w = jnp.sqrt(jnp.where(nrm <= huber_delta, 1.0, huber_delta / jnp.maximum(nrm, 1e-9)))
        w = weights * huber_w
        J = jax.jacfwd(residual_vec)(zero, T, w)
        r = residual_vec(zero, T, w)
        H = J.T @ J + damping * jnp.eye(6, dtype=T.dtype)
        g = J.T @ r
        delta = -solve6x6_spd(H, g)  # closed form; no LU loop on TPU
        return se3_exp(delta) @ T

    return jax.lax.fori_loop(0, iters, step, T_init)
