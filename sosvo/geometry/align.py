"""3D-3D rigid alignment (Kabsch-Umeyama), batched pure JAX.

TPU-native replacement for the reference's closed-form absolute-orientation
solver (SURVEY.md C11: numpy-SVD Umeyama/Horn used as the core frame-to-frame
VO pose solver [P1], and inside ATE evaluation). Weighted so it can run on
fixed-size masked point sets (invalid slots get weight 0) and be vmapped over
RANSAC hypotheses (BASELINE.json:5 "batched RANSAC hypotheses vmapped per
chip").
"""

from __future__ import annotations

import jax.numpy as jnp

from sosvo.geom.lie import rt_to_mat


def umeyama(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    with_scale: bool = False,
):
    """Weighted Kabsch-Umeyama: finds (s, R, t) minimizing sum w |dst - (s R src + t)|^2.

    Args:
      src: (..., N, 3) source points.
      dst: (..., N, 3) destination points.
      weights: (..., N) nonnegative weights (None = uniform). Zero-weight rows
        are ignored exactly -- this is how masked fixed-size sets work.
      with_scale: if True solve for similarity scale s, else s = 1 (SE(3)).

    Returns:
      T: (..., 4, 4) rigid (or similarity-applied) transform with dst ~= s*R src + t.
      scale: (...,) recovered scale (1.0 when with_scale=False).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-9)[..., None]
    mu_src = jnp.sum(src * w, axis=-2, keepdims=True) / wsum
    mu_dst = jnp.sum(dst * w, axis=-2, keepdims=True) / wsum
    src_c = src - mu_src
    dst_c = dst - mu_dst
    # Covariance sum w * dst_c src_c^T, normalized for conditioning.
    cov = jnp.einsum("...ni,...nj->...ij", dst_c * w, src_c) / wsum
    u, s, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u @ vt)
    d = jnp.ones(cov.shape[:-2] + (3,), dtype=src.dtype).at[..., 2].set(jnp.sign(det))
    R = (u * d[..., None, :]) @ vt
    if with_scale:
        var_src = jnp.sum(jnp.sum(src_c * src_c, axis=-1) * weights, axis=-1) / wsum[..., 0, 0]
        scale = jnp.sum(s * d, axis=-1) / jnp.maximum(var_src, 1e-12)
    else:
        scale = jnp.ones(cov.shape[:-2], dtype=src.dtype)
    t = mu_dst[..., 0, :] - scale[..., None] * (R @ mu_src[..., 0, :, None])[..., 0]
    return rt_to_mat(scale[..., None, None] * R, t), scale


def rigid_from_three_points(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SVD-free rigid transform from exactly 3 point pairs.

    Builds an orthonormal frame from each (centered) triangle and maps one
    onto the other: R = B_dst B_src^T, t = c_dst - R c_src. Algebraically
    exact when the correspondence is exact (the RANSAC minimal-set case);
    unlike Umeyama it needs no SVD, which matters on TPU where hundreds of
    batched small SVDs per frame dominate the vmapped-hypothesis RANSAC
    (SURVEY.md C10/C11 -- the reference pays numpy SVD per hypothesis).

    Near-collinear triangles produce a garbage-but-finite R (safe-normalized);
    such hypotheses simply score few inliers downstream.

    Args:
      src, dst: (..., 3, 3) three points (row-vectors) per problem.

    Returns:
      (..., 4, 4) rigid transforms with dst ~= T src.
    """

    def frame(p):
        e1 = p[..., 1, :] - p[..., 0, :]
        e2 = p[..., 2, :] - p[..., 0, :]
        u1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), 1e-12)
        e2p = e2 - jnp.sum(e2 * u1, axis=-1, keepdims=True) * u1
        u2 = e2p / jnp.maximum(jnp.linalg.norm(e2p, axis=-1, keepdims=True), 1e-12)
        u3 = jnp.cross(u1, u2)
        return jnp.stack([u1, u2, u3], axis=-1)          # (..., 3, 3) columns

    B_s = frame(src)
    B_d = frame(dst)
    R = B_d @ jnp.swapaxes(B_s, -1, -2)
    c_s = jnp.mean(src, axis=-2)
    c_d = jnp.mean(dst, axis=-2)
    t = c_d - jnp.einsum("...ij,...j->...i", R, c_s)
    return rt_to_mat(R, t)
