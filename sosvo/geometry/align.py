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
