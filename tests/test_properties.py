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
