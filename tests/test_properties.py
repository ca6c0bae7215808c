"""Property-based tests (SURVEY.md section 4.4): random rigid motions and
point clouds with up to 30% outliers -> RANSAC recovers the pose; SE(3)
exp/log round-trips over the whole sampled tangent space.

Shapes are FIXED across hypothesis examples so each jitted solver compiles
once and every further example is a cheap re-execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from sosvo.geom.lie import geodesic_angle, mat_inv, se3_exp, se3_log, transform_points
from sosvo.geometry.ransac import ransac_essential, ransac_rigid

K = 256       # matched-pair slots (fixed)
H = 256       # RANSAC hypotheses (fixed)

_rigid_jit = jax.jit(lambda key, a, b, v, r: ransac_rigid(
    key, a, b, v, rays_curr=r, n_hyps=H, angle_threshold=0.02, min_inliers=12))
_ess_jit = jax.jit(lambda key, r1, r2, v: ransac_essential(
    key, r1, r2, v, n_hyps=H, threshold=0.01, min_inliers=16))


def _random_problem(seed: int, angle: float, trans: float, outlier_frac: float):
    """Random cloud + rigid motion + outlier contamination (fixed shapes)."""
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    # Points in a shell around the rig (omnistereo-like geometry).
    d = jax.random.normal(k[0], (K, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    r = jax.random.uniform(k[1], (K, 1), minval=1.0, maxval=8.0)
    pts_prev = d * r
    axis = jax.random.normal(k[2], (3,))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-9)
    t_dir = jax.random.normal(k[3], (3,))
    t_dir = t_dir / jnp.maximum(jnp.linalg.norm(t_dir), 1e-9)
    tangent = jnp.concatenate([angle * axis, trans * t_dir])  # (omega, v)
    T = se3_exp(tangent)
    pts_curr = transform_points(T, pts_prev)
    # Outliers: replace a prefix-free random subset of current points.
    out = jax.random.uniform(k[4], (K,)) < outlier_frac
    junk = jax.random.normal(k[5], (K, 3)) * 5.0 + jnp.array([0.0, 0.0, 2.0])
    pts_curr = jnp.where(out[:, None], junk, pts_curr)
    rays_curr = pts_curr / jnp.maximum(
        jnp.linalg.norm(pts_curr, axis=-1, keepdims=True), 1e-9)
    return T, pts_prev, pts_curr, rays_curr, out


@settings(max_examples=12, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       angle=st.floats(0.0, 0.5),
       trans=st.floats(0.0, 0.5),
       outlier_frac=st.floats(0.0, 0.3))
def test_ransac_rigid_recovers_pose_under_outliers(seed, angle, trans, outlier_frac):
    T, pts_prev, pts_curr, rays_curr, out = _random_problem(
        seed, angle, trans, outlier_frac)
    valid = jnp.ones((K,), bool)
    res = _rigid_jit(jax.random.PRNGKey(seed ^ 0x5EED), pts_prev, pts_curr,
                     valid, rays_curr)
    assert bool(res.ok)
    rot_err = float(geodesic_angle(res.model[:3, :3], T[:3, :3]))
    t_err = float(jnp.linalg.norm(res.model[:3, 3] - T[:3, 3]))
    assert rot_err < 0.01, (rot_err, outlier_frac)
    assert t_err < 0.02, (t_err, outlier_frac)
    # Inlier classification: no declared inlier may be a planted outlier
    # *that moved materially* (a junk point can land near its true image).
    junk_dist = jnp.linalg.norm(
        pts_curr - transform_points(T, pts_prev), axis=-1)
    misclassified = res.inliers & out & (junk_dist > 0.2)
    assert int(jnp.sum(misclassified.astype(jnp.int32))) == 0


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       angle=st.floats(0.0, 0.4),
       outlier_frac=st.floats(0.0, 0.3))
def test_ransac_essential_recovers_rotation_under_outliers(seed, angle, outlier_frac):
    T, pts_prev, pts_curr, rays_curr, _ = _random_problem(
        seed, angle, 0.3, outlier_frac)
    rays_prev = pts_prev / jnp.linalg.norm(pts_prev, axis=-1, keepdims=True)
    valid = jnp.ones((K,), bool)
    res, R, t = _ess_jit(jax.random.PRNGKey(seed ^ 0xE55), rays_prev,
                         rays_curr, valid)
    assert bool(res.ok)
    rot_err = float(geodesic_angle(R, T[:3, :3]))
    assert rot_err < 0.02, (rot_err, outlier_frac)
    # Translation is scale-free in the 2D-2D path: check direction only.
    # Margin note: at ~20% outliers the refit translation direction can sit
    # ~10 deg off on unlucky draws (seed 74 reproduces 0.985 on all
    # implementations to date) -- the rotation is what the pipeline's
    # essential GATE consumes, so the direction bound stays loose.
    t_gt = T[:3, 3] / jnp.maximum(jnp.linalg.norm(T[:3, 3]), 1e-9)
    cosang = float(jnp.abs(jnp.sum(t * t_gt)))
    assert cosang > 0.97, cosang


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       scale=st.floats(1e-6, 3.0))
def test_se3_exp_log_roundtrip(seed, scale):
    tau = scale * jax.random.normal(jax.random.PRNGKey(seed), (6,))
    # Keep the rotation magnitude strictly inside the principal domain
    # (lie.py convention: tau = (omega[3], v[3]), rotation first).
    wn = jnp.linalg.norm(tau[:3])
    tau = jnp.where(wn > 3.0, tau * (3.0 / wn), tau)
    T = se3_exp(tau)
    tau2 = se3_log(T)
    np.testing.assert_allclose(np.asarray(tau2), np.asarray(tau),
                               rtol=2e-4, atol=2e-5)
    # exp(log) inverse composition is the identity.
    err = jnp.max(jnp.abs(se3_exp(tau2) @ mat_inv(T) - jnp.eye(4)))
    assert float(err) < 1e-4


# --- Procrustes robustness on rank-deficient covariances (VERDICT r3 #1) ---
#
# The QCP Newton + inverse-iteration path must stay FINITE (and optimal when
# the optimum is unique) for every covariance rank and scale. The killer case
# is a symmetric near-rank-1 covariance -- what an ATE alignment of two
# almost-identical near-collinear trajectories produces: the Horn matrix's
# top eigenvalue is then a near-double root, f32 Newton can land below it,
# and an insufficient PD shift explodes the floored Cholesky (the r3 bug).

from sosvo.geometry.align import procrustes_rotation

_proc_jit = jax.jit(procrustes_rotation)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       rank=st.integers(1, 3),
       log_scale=st.floats(-8.0, 3.0),
       symmetric=st.booleans(),
       perturb=st.floats(0.0, 1e-4))
def test_procrustes_finite_and_optimal_on_rank_deficient_covariances(
        seed, rank, log_scale, symmetric, perturb):
    rng = np.random.default_rng(seed)
    s = 10.0 ** log_scale
    vecs = rng.normal(size=(rank, 3))
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    if symmetric:
        M = sum(np.outer(v, v) for v in vecs)
    else:
        ws = rng.normal(size=(rank, 3))
        M = sum(np.outer(w, v) for w, v in zip(ws, vecs))
    M = s * (M + perturb * rng.normal(size=(3, 3)))
    R = np.asarray(_proc_jit(jnp.asarray(M, jnp.float32)), np.float64)
    # Always finite, always a proper rotation.
    assert np.all(np.isfinite(R)), (M, R)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    assert np.linalg.det(R) > 0.9
    # Optimal (up to degeneracy): objective within tolerance of the f64 SVD
    # optimum. Near-rank-deficient M leaves rotational ambiguity whose
    # objective cost is ~0, so comparing OBJECTIVES (not R) is the right
    # property.
    U, sv, Vt = np.linalg.svd(M)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    R0 = U @ D @ Vt
    obj, obj0 = np.einsum("ij,ij->", R, M), np.einsum("ij,ij->", R0, M)
    assert obj >= obj0 - 1e-3 * max(np.abs(obj0), s, 1e-6), (obj, obj0, M)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       log_span=st.floats(-6.0, 0.0),
       n=st.integers(3, 8))
def test_ate_finite_on_near_collinear_trajectories(seed, log_span, n):
    """ate_rmse (umeyama under the hood) on two nearly identical
    near-collinear trajectories of any span: finite, tiny."""
    from sosvo.eval.ate import ate_rmse
    rng = np.random.default_rng(seed)
    span = 10.0 ** log_span
    d = rng.normal(size=3)
    d /= np.linalg.norm(d)
    t = np.linspace(0.0, span, n)[:, None] * d[None, :]
    est = t + rng.normal(size=(n, 3)) * span * 1e-3
    gt = t + rng.normal(size=(n, 3)) * span * 1e-3
    rmse, _ = ate_rmse(jnp.asarray(est, jnp.float32), jnp.asarray(gt, jnp.float32))
    assert np.isfinite(float(rmse)), (span, est, gt)
    assert float(rmse) < 10.0 * span * 1e-2 + 1e-6
