"""Relocalization after tracking loss (SURVEY.md C15 recovery; r5).

Pure frame-to-frame VO can only identity-hold through a dropout, so once the
rig moves during it the trajectory keeps a permanent offset -- the reference
pipeline has exactly this failure mode [P1]. The keyframe map makes the
absolute pose recoverable: `vo/ba_pipeline.try_relocalize` matches a lost
frame's stereo features against the landmark map and re-acquires the pose by
3D-3D RANSAC, cond-gated so tracked frames pay nothing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.sensor.rig import default_rig
from sosvo.synth.scene import make_scene, observe_sequence
from sosvo.utils.config import BAConfig, FrontendConfig, PipelineConfig, RansacConfig
from sosvo.vo.ba_pipeline import init_ba_state, run_replay_ba

K = 256
F = 24
DROP = slice(8, 13)  # frames with dead descriptors (sensor dropout)


def _setup(relocalize: bool):
    rig = default_rig()
    cfg = PipelineConfig(
        frontend=FrontendConfig(max_features=K),
        ransac=RansacConfig(n_hyps=256),
        ba=BAConfig(window=5, max_landmarks=512, iters=3),
        relocalize=relocalize,
    )
    scene = make_scene(jax.random.PRNGKey(0), n_frames=F, n_landmarks=4096)
    obs = observe_sequence(rig, scene, K, jax.random.PRNGKey(1),
                           pixel_noise=0.3, desc_flip_prob=0.02)
    # Sensor dropout: descriptors die (random bits) in BOTH views for a
    # window of frames while the rig keeps moving.
    kd = jax.random.PRNGKey(7)
    garbage = jax.random.randint(
        kd, obs.desc_top[DROP].shape, 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
    obs = obs._replace(
        desc_top=obs.desc_top.at[DROP].set(garbage),
        desc_bottom=obs.desc_bottom.at[DROP].set(
            jax.random.randint(jax.random.fold_in(kd, 1),
                               obs.desc_bottom[DROP].shape, 0,
                               2**31 - 1, jnp.int32).astype(jnp.uint32)),
    )
    state = init_ba_state(cfg, jax.random.PRNGKey(2), T0=scene.poses[0])
    _, outs = jax.jit(lambda s, o: run_replay_ba(rig, cfg, s, o))(state, obs)
    return scene, outs


def _post_dropout_err(scene, outs):
    est = np.asarray(outs.vo.T_world[14:, :3, 3])
    gt = np.asarray(scene.poses[14:, :3, 3])
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=-1))))


def test_relocalization_recovers_absolute_pose_after_dropout():
    scene, outs = _setup(relocalize=True)
    ok = np.asarray(outs.vo.pose_ok)
    # Tracking healthy before the dropout, lost during it.
    assert ok[1:8].all()
    assert not ok[9:13].any()
    # First clean frame relocalizes against the map; trajectory back on
    # truth afterwards (NO Horn alignment here -- the claim is the ABSOLUTE
    # pose, which f2f identity-hold cannot recover).
    assert ok[14:].all()
    err = _post_dropout_err(scene, outs)
    assert err < 0.05, err


def test_without_relocalization_dropout_leaves_permanent_offset():
    scene_r, outs_r = _setup(relocalize=True)
    scene, outs = _setup(relocalize=False)
    err_off = _post_dropout_err(scene, outs)
    err_on = _post_dropout_err(scene_r, outs_r)
    # The rig moved during the dropout; the identity-hold offset persists
    # and dominates the relocalized error.
    assert err_off > 3.0 * err_on, (err_off, err_on)
    assert err_off > 0.05, err_off


def test_batched_reloc_matches_sequential():
    """One lane suffers a dropout; batched replay (scalar any-lane cond +
    vmapped reloc) must match the per-lane sequential result."""
    from sosvo.vo.batched import init_batched_ba_states, run_replay_ba_batched

    rig = default_rig()
    cfg = PipelineConfig(
        frontend=FrontendConfig(max_features=K),
        ransac=RansacConfig(n_hyps=256),
        ba=BAConfig(window=5, max_landmarks=512, iters=3),
        relocalize=True,
    )
    S = 2
    keys = jax.random.split(jax.random.PRNGKey(0), S)
    scenes = [make_scene(kk, n_frames=F, n_landmarks=4096) for kk in keys]
    obs_l = [observe_sequence(rig, sc, K, kk, pixel_noise=0.3,
                              desc_flip_prob=0.02)
             for sc, kk in zip(scenes, keys)]
    kd = jax.random.PRNGKey(7)
    garbage = jax.random.randint(kd, obs_l[1].desc_top[DROP].shape, 0,
                                 2**31 - 1, jnp.int32).astype(jnp.uint32)
    obs_l[1] = obs_l[1]._replace(
        desc_top=obs_l[1].desc_top.at[DROP].set(garbage))
    obs = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_l)
    T0 = jnp.stack([sc.poses[0] for sc in scenes])

    st = init_batched_ba_states(S, cfg, jax.random.PRNGKey(2), T0=T0)
    _, outs_b = jax.jit(lambda s, o: run_replay_ba_batched(rig, cfg, s, o))(
        st, obs)

    for lane in range(S):
        st1 = init_ba_state(cfg, jax.random.PRNGKey(2), T0=T0[lane])
        # Match the batched init exactly: init_batched_ba_states splits the
        # key per lane.
        st1 = jax.tree.map(lambda x: x[lane],
                           init_batched_ba_states(S, cfg,
                                                  jax.random.PRNGKey(2),
                                                  T0=T0))
        _, outs_s = jax.jit(lambda s, o: run_replay_ba(rig, cfg, s, o))(
            st1, jax.tree.map(lambda x: x[lane], obs))
        np.testing.assert_allclose(
            np.asarray(outs_b.vo.T_world[lane]),
            np.asarray(outs_s.vo.T_world), atol=2e-4)


def test_reloc_does_not_fire_on_healthy_frames():
    rig = default_rig()
    cfg = PipelineConfig(
        frontend=FrontendConfig(max_features=K),
        ransac=RansacConfig(n_hyps=256),
        ba=BAConfig(window=5, max_landmarks=512, iters=3),
        relocalize=True,
    )
    scene = make_scene(jax.random.PRNGKey(3), n_frames=10, n_landmarks=4096)
    obs = observe_sequence(rig, scene, K, jax.random.PRNGKey(4),
                           pixel_noise=0.3, desc_flip_prob=0.02)
    state = init_ba_state(cfg, jax.random.PRNGKey(5), T0=scene.poses[0])
    _, outs = jax.jit(lambda s, o: run_replay_ba(rig, cfg, s, o))(state, obs)
    cfg_off = PipelineConfig(
        frontend=FrontendConfig(max_features=K),
        ransac=RansacConfig(n_hyps=256),
        ba=BAConfig(window=5, max_landmarks=512, iters=3),
        relocalize=False,
    )
    state = init_ba_state(cfg_off, jax.random.PRNGKey(5), T0=scene.poses[0])
    _, outs_off = jax.jit(lambda s, o: run_replay_ba(rig, cfg_off, s, o))(state, obs)
    # On a healthy sequence the reloc-enabled replay is bit-identical to
    # the disabled one (the cond never takes the reloc branch).
    np.testing.assert_array_equal(np.asarray(outs.vo.T_world),
                                  np.asarray(outs_off.vo.T_world))
