"""Essential-matrix estimation on the sphere, batched pure JAX.

TPU-native replacement for the reference's omnidirectional epipolar module
(SURVEY.md C9: 8-point-style E estimation from unit-ray correspondences,
`r2^T E r1 = 0` directly on sphere rays -- no image-plane normalization step
exists for omnidirectional cameras, the rays ARE the normalized coordinates).
Required by BASELINE.json:5 ("RANSAC essential-matrix estimation on the
sphere") and config c1 (BASELINE.json:7).

Convention: for a point X seen as ray r1 in frame 1 and r2 in frame 2, with
frame-2-from-frame-1 motion X2 = R X1 + t, the constraint is
    r2^T E r1 = 0,   E = [t]_x R.

Fit: weighted DLT. Each correspondence contributes a row a = vec(r2 r1^T)
(row-major pairing with vec(E)); the solution is the eigenvector of the
smallest eigenvalue of sum_i w_i a_i a_i^T (9x9 symmetric eigh -- batched,
no tall SVD, TPU-friendly). Weights make fixed-size masked sets and RANSAC
minimal-set selection exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sosvo.geom.lie import hat
from sosvo.geometry.triangulate import midpoint_triangulate


def essential_rows(rays1: jnp.ndarray, rays2: jnp.ndarray) -> jnp.ndarray:
    """Per-correspondence DLT rows: (..., N, 9) with a = vec(r2 r1^T)."""
    outer = rays2[..., :, None] * rays1[..., None, :]  # (..., N, 3, 3): r2_j r1_k
    return outer.reshape(outer.shape[:-2] + (9,))


def fit_essential(rays1: jnp.ndarray, rays2: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted 8-point fit on the sphere -> (..., 3, 3) essential matrix."""
    a = essential_rows(rays1, rays2)
    ata = jnp.einsum("...ni,...nj->...ij", a * weights[..., None], a)
    # Smallest-eigenvalue eigenvector of the 9x9 normal matrix.
    _, vecs = jnp.linalg.eigh(ata)
    e = vecs[..., :, 0]
    E = e.reshape(e.shape[:-1] + (3, 3))
    # Scale-normalize (E is homogeneous).
    return E / jnp.maximum(jnp.linalg.norm(E, axis=(-2, -1), keepdims=True), 1e-12)


def fit_essential_fast(rays1: jnp.ndarray, rays2: jnp.ndarray,
                       weights: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """Smallest-eigenvector fit by Cholesky inverse iteration (no eigh).

    For RANSAC minimal sets the 9x9 normal matrix has an (almost) exact null
    vector, so one-two inverse iterations on (M + eps*I) isolate it: the null
    direction is amplified by 1/eps vs 1/lambda_i for the rest. Batched 9x9
    Cholesky + triangular solves are ~an order of magnitude cheaper than
    batched eigh on TPU, which made the essential hypothesis batch half the
    VO frame cost. The exact eigh fit remains for the final refit.
    """
    a = essential_rows(rays1, rays2)
    M = jnp.einsum("...ni,...nj->...ij", a * weights[..., None], a)
    scale = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None] / 9.0 + 1e-12
    eps = 1e-5
    L = jnp.linalg.cholesky(M / scale + eps * jnp.eye(9, dtype=M.dtype))
    v = jnp.ones(M.shape[:-2] + (9, 1), M.dtype) / 3.0

    for _ in range(iters):
        y = jax.scipy.linalg.solve_triangular(L, v, lower=True)
        v = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), y, lower=False)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=(-2, -1), keepdims=True), 1e-30)

    E = v[..., :, 0].reshape(M.shape[:-2] + (3, 3))
    return E / jnp.maximum(jnp.linalg.norm(E, axis=(-2, -1), keepdims=True), 1e-12)


def epipolar_residual_sin(E: jnp.ndarray, rays1: jnp.ndarray, rays2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric SINE of the ray-to-epipolar-plane angle (no arcsin).

    Monotone in the angle and equal to it to first order, so RANSAC can
    threshold on sin(thr) ~= thr directly -- saving ~H*K transcendentals per
    frame in the hypothesis-scoring hot loop.
    """
    Er1 = jnp.einsum("...ij,...nj->...ni", E, rays1)
    Etr2 = jnp.einsum("...ji,...nj->...ni", E, rays2)
    num = jnp.abs(jnp.sum(rays2 * Er1, axis=-1))
    s1 = num / jnp.maximum(jnp.linalg.norm(Er1, axis=-1), 1e-9)
    s2 = num / jnp.maximum(jnp.linalg.norm(Etr2, axis=-1), 1e-9)
    return 0.5 * (s1 + s2)


def epipolar_residual_angle(E: jnp.ndarray, rays1: jnp.ndarray, rays2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric angular distance (radians) of rays from their epipolar planes.

    For unit rays, |r2 . n| with n = E r1 / |E r1| is the sine of the angle
    between r2 and the epipolar plane of r1 -- the spherical analog of
    point-to-epiline distance (SURVEY.md C10 "angular reprojection threshold
    on sphere"). Symmetrized over both directions.
    """
    Er1 = jnp.einsum("...ij,...nj->...ni", E, rays1)
    Etr2 = jnp.einsum("...ji,...nj->...ni", E, rays2)
    num = jnp.abs(jnp.sum(rays2 * Er1, axis=-1))
    s1 = num / jnp.maximum(jnp.linalg.norm(Er1, axis=-1), 1e-9)
    s2 = num / jnp.maximum(jnp.linalg.norm(Etr2, axis=-1), 1e-9)
    return 0.5 * (jnp.arcsin(jnp.clip(s1, 0.0, 1.0)) + jnp.arcsin(jnp.clip(s2, 0.0, 1.0)))


def essential_from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """E = [t]_x R (unit-normalized)."""
    E = hat(t) @ R
    return E / jnp.maximum(jnp.linalg.norm(E, axis=(-2, -1), keepdims=True), 1e-12)


def decompose_essential(
    E: jnp.ndarray,
    rays1: jnp.ndarray,
    rays2: jnp.ndarray,
    weights: jnp.ndarray,
):
    """Recover (R, t_unit) from E with spherical cheirality disambiguation.

    Produces the 4 standard candidates (R1/R2 x +-t) from the SVD of E and
    selects the one maximizing the weighted count of correspondences that
    triangulate with positive range along BOTH rays -- the cheirality test
    generalized to sphere rays (no "in front of camera" plane; SURVEY.md C9).

    Returns:
      R: (..., 3, 3) rotation (frame2 from frame1).
      t: (..., 3) unit translation (scale is unobservable from E).
      support: (...,) weighted cheirality-consistent correspondence count.
    """
    u, _, vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    du = jnp.linalg.det(u)
    dv = jnp.linalg.det(vt)
    u = u * jnp.stack([jnp.ones_like(du), jnp.ones_like(du), du], axis=-1)[..., None, :]
    vt = vt * jnp.stack([jnp.ones_like(dv), jnp.ones_like(dv), dv], axis=-1)[..., :, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    Ra = u @ W @ vt
    Rb = u @ W.T @ vt
    tt = u[..., :, 2]

    def support_of(R, t):
        # Camera 1 at origin; camera 2 center in frame 1 is -R^T t; ray2 in
        # frame 1 is R^T r2. Positive-range triangulation on both rays.
        Rt = jnp.swapaxes(R, -1, -2)
        c2 = -(Rt @ t[..., None])[..., 0]
        r2_in_1 = jnp.einsum("...ij,...nj->...ni", Rt, rays2)
        tri = midpoint_triangulate(
            rays1, r2_in_1,
            jnp.zeros_like(c2)[..., None, :], c2[..., None, :],
            min_angle=1e-4, max_range=1e6, max_gap=1e6,
        )
        return jnp.sum(weights * tri.valid.astype(weights.dtype), axis=-1)

    cands_R = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    cands_t = jnp.stack([tt, -tt, tt, -tt], axis=-2)
    supports = jnp.stack(
        [support_of(cands_R[..., i, :, :], cands_t[..., i, :]) for i in range(4)], axis=-1
    )
    best = jnp.argmax(supports, axis=-1)
    R = jnp.take_along_axis(cands_R, best[..., None, None, None].repeat(3, -2).repeat(3, -1), axis=-3)[..., 0, :, :]
    t = jnp.take_along_axis(cands_t, best[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    return R, t, jnp.max(supports, axis=-1)
