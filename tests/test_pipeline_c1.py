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


def _run_c1(pixel_noise=0.0, desc_flip=0.0, n_frames=10, k=512):
    rig = default_rig()
    scene = make_scene(jax.random.PRNGKey(0), n_frames=n_frames, n_landmarks=4096)
    obs = observe_sequence(
        rig, scene, k, jax.random.PRNGKey(1),
        pixel_noise=pixel_noise, desc_flip_prob=desc_flip,
    )
    cfg = PipelineConfig()
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
