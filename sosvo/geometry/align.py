"""3D-3D rigid alignment (Kabsch-Umeyama), batched pure JAX.

TPU-native replacement for the reference's closed-form absolute-orientation
solver (SURVEY.md C11: numpy-SVD Umeyama/Horn used as the core frame-to-frame
VO pose solver [P1], and inside ATE evaluation). Weighted so it can run on
fixed-size masked point sets (invalid slots get weight 0) and be vmapped over
RANSAC hypotheses (BASELINE.json:5 "batched RANSAC hypotheses vmapped per
chip").
"""

from __future__ import annotations

import jax
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
    # Rotation via Horn's quaternion method (no SVD: a single small
    # jnp.linalg.svd lowers to an iterative loop costing ~100s of us on TPU,
    # and this runs once per frame in the RANSAC refit). The quaternion
    # parameterization returns a proper rotation by construction -- the same
    # result as Kabsch's det-sign correction.
    R = procrustes_rotation(cov)
    if with_scale:
        var_src = jnp.sum(jnp.sum(src_c * src_c, axis=-1) * weights, axis=-1) / wsum[..., 0, 0]
        # Optimal scale given R: tr(R^T cov) / var_src (equal to Umeyama's
        # singular-value form at the optimum).
        tr = jnp.einsum("...ij,...ij->...", R, cov)
        scale = tr / jnp.maximum(var_src, 1e-12)
    else:
        scale = jnp.ones(cov.shape[:-2], dtype=src.dtype)
    t = mu_dst[..., 0, :] - scale[..., None] * (R @ mu_src[..., 0, :, None])[..., 0]
    return rt_to_mat(scale[..., None, None] * R, t), scale


def _chol4(M: jnp.ndarray) -> jnp.ndarray:
    """Batched 4x4 Cholesky, fully unrolled into elementwise ops (no library
    loop kernels, no gathers -- see `_chol9` in geometry/essential.py for the
    measured rationale)."""
    n = 4
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        # Floor at 1e-12 (not 1e-30): a slightly INDEFINITE input -- e.g. the
        # Procrustes shift matrix when f32 Newton lands a hair below
        # lambda_max -- would otherwise give d ~ 1e-15, inv_d ~ 1e15, and the
        # squared terms of later columns overflow to inf and cascade to NaN
        # (inf - inf). With the floor, intermediates stay finite and the
        # inverse-iteration caller is insensitive to the sign/scale noise.
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    zero = jnp.zeros_like(M[..., 0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
            for i in range(n)]
    return jnp.stack(rows, axis=-2)


def _chol4_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(L L^T) x = b by unrolled forward+back substitution; b: (..., 4)."""
    n = 4
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[k]
        y[i] = s / L[..., i, i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


def _adj4(K: jnp.ndarray) -> jnp.ndarray:
    """Adjugate of a (..., 4, 4) matrix, closed form (16 unrolled 3x3 dets)."""

    def det3(m):
        return (m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
                - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
                + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]))

    cols = []
    for i in range(4):           # column i of adj
        rows_keep = jnp.array([r for r in range(4) if r != i])
        entries = []
        for j in range(4):       # adj[j, i] = (-1)^{i+j} det(K del row i, col j)
            cols_keep = jnp.array([c for c in range(4) if c != j])
            m = K[..., rows_keep[:, None], cols_keep[None, :]]
            entries.append(((-1.0) ** (i + j)) * det3(m))
        cols.append(jnp.stack(entries, axis=-1))     # (..., 4) = adj[:, i]
    return jnp.stack(cols, axis=-1)


def procrustes_rotation(M: jnp.ndarray, iters: int = 16) -> jnp.ndarray:
    """Rotation R maximizing tr(R^T M), SVD-free (Horn's quaternion method).

    On TPU a single small `jnp.linalg.svd`/`eigh` lowers to an iterative
    one-sided-Jacobi/QR loop costing tens-to-hundreds of microseconds -- per
    FRAME that dwarfs the whole matmul pipeline around it. Horn's classic
    alternative: tr(R(q)^T M) = q^T N(M) q for unit quaternions q, so the
    optimum is the largest eigenpair of a symmetric 4x4 -- computed here the
    QCP way (Newton on the quartic characteristic polynomial + adjugate
    kernel extraction): closed-form, fixed iteration count, no
    data-dependent control flow, and no eigen-gap sensitivity. Always
    returns a PROPER rotation (the quaternion parameterization cannot
    express a reflection), which is exactly Kabsch's det-correction
    behavior. Degenerate M (ambiguous rotation, e.g. all-zero weights)
    returns a finite valid rotation among the optima.

    Args:
      M: (..., 3, 3) correlation matrix sum_k w_k dst_k src_k^T
         (same convention as `umeyama`'s weighted covariance).
      iters: fixed Newton iteration count for lambda_max.

    Returns:
      (..., 3, 3) rotations with dst ~= R src in the least-squares sense.
    """
    m = M
    t00, t01, t02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    t10, t11, t12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    t20, t21, t22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    # N(M): q^T N q = tr(R(q)^T M), q = (w, x, y, z).
    N = jnp.stack([
        jnp.stack([t00 + t11 + t22, t21 - t12, t02 - t20, t10 - t01], axis=-1),
        jnp.stack([t21 - t12, t00 - t11 - t22, t10 + t01, t02 + t20], axis=-1),
        jnp.stack([t02 - t20, t10 + t01, t11 - t00 - t22, t21 + t12], axis=-1),
        jnp.stack([t10 - t01, t02 + t20, t21 + t12, t22 - t00 - t11], axis=-1),
    ], axis=-2)                                              # (..., 4, 4)
    # QCP-style largest eigenpair (Theobald 2005): N is TRACELESS, so its
    # characteristic polynomial is a depressed quartic
    #   P(x) = x^4 + c2 x^2 + c1 x + c0,
    #   c2 = -tr(N^2)/2, c1 = -tr(N^3)/3, c0 = (tr(N^2)^2/2 - tr(N^4))/4
    # (Newton's identities with e1 = 0). lambda_max is found by Newton from
    # the upper bound sqrt(tr(N^2)) -- monotone from above for a polynomial
    # with all-real roots -- and the eigenvector is the largest column of
    # adj(N - lambda I) (rank-3 kernel extraction). Unlike shifted power
    # iteration this has no eigen-gap sensitivity: near-rank-1 covariances
    # (almost-collinear point sets) converge just as fast.
    scale = jnp.linalg.norm(N, axis=(-2, -1), keepdims=True) + 1e-30
    Nn = N / scale
    N2 = Nn @ Nn
    N3 = N2 @ Nn
    p2 = jnp.trace(N2, axis1=-2, axis2=-1)
    p3 = jnp.trace(N3, axis1=-2, axis2=-1)
    p4 = jnp.trace(N2 @ N2, axis1=-2, axis2=-1)
    c2, c1, c0 = -0.5 * p2, -p3 / 3.0, 0.25 * (0.5 * p2 * p2 - p4)
    lam = jnp.sqrt(jnp.maximum(p2, 1e-30))

    def newton(_, lam):
        P = ((lam * lam + c2) * lam + c1) * lam + c0
        dP = (4.0 * lam * lam + 2.0 * c2) * lam + c1
        return lam - P / jnp.where(jnp.abs(dP) < 1e-20,
                                   jnp.where(dP >= 0, 1e-20, -1e-20), dP)

    lam = jax.lax.fori_loop(0, iters, newton, lam)
    # Kernel extraction by inverse iteration on S = (lam + eps) I - Nn: S is
    # PSD with its smallest eigenvalue ~ eps exactly at the target
    # eigenvector, so two unrolled-Cholesky solves amplify it by ~1/eps.
    # (The r2 implementation extracted ker(Nn - lam I) as the largest column
    # of the 4x4 adjugate -- 16 fancy-indexed 3x3 minors, i.e. 16 TPU gather
    # ops: measured 180 us single-instance on v5e, the dominant cost of every
    # per-frame umeyama refit. This form is pure elementwise math.)
    S = (lam[..., None, None] + 1e-6) * jnp.broadcast_to(
        jnp.eye(4, dtype=M.dtype), N.shape) - Nn
    L = _chol4(S)
    q = jnp.broadcast_to(
        jnp.asarray([0.5, 0.5, 0.5, 0.5], M.dtype), N.shape[:-1])
    for _ in range(2):
        q = _chol4_solve(L, q)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)
    return R


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
