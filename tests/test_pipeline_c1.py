"""Golden integration test: benchmark config c1 (BASELINE.json:7).

Synthetic 10-frame omnistereo sequence, ~500 features/frame, observation-mode
pipeline: match + RANSAC E + triangulation, frame-to-frame pose only. On
noiseless synthetic input the recovered trajectory must be near-exact
(SURVEY.md SS4.2; BASELINE.md row c1 "expect ~0 ATE").
"""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.eval.ate import ate_rmse, rpe
from sosvo.sensor.rig import default_rig
from sosvo.synth.scene import make_scene, observe_sequence
from sosvo.utils.config import PipelineConfig
from sosvo.vo.pipeline import run_replay, step
from sosvo.vo.state import init_track_state


def _run_c1(pixel_noise=0.0, desc_flip=0.0, n_frames=10, k=512, **cfg_kw):
    rig = default_rig()
    scene = make_scene(jax.random.PRNGKey(0), n_frames=n_frames, n_landmarks=4096)
    obs = observe_sequence(
        rig, scene, k, jax.random.PRNGKey(1),
        pixel_noise=pixel_noise, desc_flip_prob=desc_flip,
    )
    cfg = PipelineConfig(**cfg_kw)
    state = init_track_state(k, jax.random.PRNGKey(2), T0=scene.poses[0])

    replay = jax.jit(lambda s, o: run_replay(rig, cfg, s, o))
    final, outs = replay(state, obs)
    return scene, outs


def test_c1_noiseless_near_zero_ate():
    scene, outs = _run_c1()
    # Frame 0 bootstraps (no previous frame); poses from frame 1 on.
    est = outs.T_world[1:]
    gt = scene.poses[1:]
    assert bool(jnp.all(outs.pose_ok[1:])), np.asarray(outs.pose_ok)
    assert int(jnp.min(outs.n_stereo)) > 150, np.asarray(outs.n_stereo)
    assert int(jnp.min(outs.n_temporal[1:])) > 100, np.asarray(outs.n_temporal)
    rmse, _ = ate_rmse(est[:, :3, 3], gt[:, :3, 3])
    assert float(rmse) < 2e-3, float(rmse)
    t_rpe, r_rpe = rpe(est, gt)
    assert float(t_rpe) < 2e-3
    assert float(r_rpe) < 2e-3


def test_c1_noisy_small_ate():
    scene, outs = _run_c1(pixel_noise=0.3, desc_flip=0.02)
    est = outs.T_world[1:]
    gt = scene.poses[1:]
    assert bool(jnp.all(outs.pose_ok[1:]))
    rmse, _ = ate_rmse(est[:, :3, 3], gt[:, :3, 3])
    assert float(rmse) < 0.08, float(rmse)


def test_step_jits_without_retrace():
    rig = default_rig()
    scene = make_scene(jax.random.PRNGKey(3), n_frames=3, n_landmarks=2048)
    obs = observe_sequence(rig, scene, 256, jax.random.PRNGKey(4))
    cfg = PipelineConfig()
    state = init_track_state(256, jax.random.PRNGKey(5), T0=scene.poses[0])

    f = jax.jit(lambda s, o: step(rig, cfg, s, o))
    o0 = jax.tree.map(lambda x: x[0], obs)
    o1 = jax.tree.map(lambda x: x[1], obs)
    state, _ = f(state, o0)
    n0 = f._cache_size()
    state, _ = f(state, o1)
    assert f._cache_size() == n0  # no retrace across frames


def test_tracking_loss_recovery():
    """Corrupt a mid-sequence frame; the pipeline must hold pose (identity
    motion) on the bad frame and resume tracking afterwards without NaNs."""
    rig = default_rig()
    scene = make_scene(jax.random.PRNGKey(20), n_frames=8, n_landmarks=4096)
    obs = observe_sequence(rig, scene, 256, jax.random.PRNGKey(21),
                           pixel_noise=0.2, desc_flip_prob=0.01)
    # Scramble frame 4's descriptors completely.
    bad = jax.random.bits(jax.random.PRNGKey(22), obs.desc_top[4].shape,
                          dtype=jnp.uint32)
    obs = obs._replace(
        desc_top=obs.desc_top.at[4].set(bad),
        desc_bottom=obs.desc_bottom.at[4].set(bad),
    )
    cfg = PipelineConfig()
    state = init_track_state(256, jax.random.PRNGKey(23), T0=scene.poses[0])
    _, outs = jax.jit(lambda s, o: run_replay(rig, cfg, s, o))(state, obs)
    ok = np.asarray(outs.pose_ok)
    assert not ok[4]           # the corrupted frame fails (and also breaks
    assert not ok[5]           # the 4->5 temporal link: its prev is garbage)
    assert ok[6] and ok[7]     # tracking resumes two frames later
    assert not np.isnan(np.asarray(outs.T_world)).any()
    # Pose error stays bounded: the two held frames cost at most the motion
    # of two frames, with no blow-up afterwards.
    err7 = float(jnp.linalg.norm(outs.T_world[7, :3, 3] - scene.poses[7, :3, 3]))
    assert err7 < 0.2, err7


def test_lazy_gate_matches_eager_on_clean_and_noisy_data():
    """lazy_essential_gate skips the 2D-2D cross-check on confidently
    tracked frames; the trajectory must match the eager gate wherever the
    gate would have passed anyway (every frame here)."""
    for noise, flips in ((0.0, 0.0), (0.3, 0.02), (1.0, 0.08)):
        _, outs_e = _run_c1(pixel_noise=noise, desc_flip=flips,
                            lazy_essential_gate=False)
        scene, outs_l = _run_c1(pixel_noise=noise, desc_flip=flips,
                                lazy_essential_gate=True)
        assert bool(jnp.all(outs_l.pose_ok[1:] == outs_e.pose_ok[1:]))
        d = float(jnp.max(jnp.abs(outs_l.T_world - outs_e.T_world)))
        assert d < 1e-5, d


def test_lazy_gate_still_fails_safely_on_garbage():
    """The questionable-frame predicate must fire (or rigid itself fail) on
    garbage input: identical recovery behavior to the eager gate."""
    scene, outs = _run_c1(pixel_noise=5.0, desc_flip=0.45,
                          lazy_essential_gate=True)
    assert not bool(jnp.any(outs.pose_ok))
    assert bool(jnp.all(jnp.isfinite(outs.T_world)))


def test_lazy_gate_runs_gate_on_questionable_frames():
    """With the ratio forced to 1.1 the gate can never be skipped: results
    must be bit-identical to the eager path (proves the cond's run-branch
    IS the eager gate, not an approximation)."""
    _, outs_e = _run_c1(pixel_noise=0.3, desc_flip=0.02,
                        lazy_essential_gate=False)
    _, outs_l = _run_c1(pixel_noise=0.3, desc_flip=0.02,
                        lazy_essential_gate=True, lazy_gate_ratio=1.1)
    assert float(jnp.max(jnp.abs(outs_l.T_world - outs_e.T_world))) == 0.0
    assert bool(jnp.all(outs_l.ess_angle_err == outs_e.ess_angle_err))
