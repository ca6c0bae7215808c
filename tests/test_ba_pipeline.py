"""Windowed-BA VO pipeline (config c2 core): keyframes + map + BA in the scan.

Golden invariants on a fixed-seed noisy synthetic sequence: the BA-corrected
trajectory must beat plain frame-to-frame VO, the landmark map must fill and
recycle within its fixed slots, and the whole thing must stay one jitted scan.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.eval.ate import ate_rmse
from sosvo.sensor.rig import default_rig
from sosvo.synth.scene import make_scene, observe_sequence
from sosvo.utils.config import PipelineConfig
from sosvo.vo.ba_pipeline import init_ba_state, run_replay_ba
from sosvo.vo.pipeline import run_replay
from sosvo.vo.state import init_track_state

F, K = 40, 512


def _replays():
    rig = default_rig()
    scene = make_scene(jax.random.PRNGKey(0), n_frames=F, n_landmarks=4096)
    obs = observe_sequence(rig, scene, K, jax.random.PRNGKey(1),
                           pixel_noise=0.3, desc_flip_prob=0.02)
    cfg = PipelineConfig()

    st = init_track_state(K, jax.random.PRNGKey(2), T0=scene.poses[0])
    _, o_f2f = jax.jit(lambda s, o: run_replay(rig, cfg, s, o))(st, obs)

    sba = init_ba_state(cfg, jax.random.PRNGKey(2), T0=scene.poses[0])
    _, o_ba = jax.jit(lambda s, o: run_replay_ba(rig, cfg, s, o))(sba, obs)
    return scene, o_f2f, o_ba, cfg


def test_ba_pipeline_beats_frame_to_frame():
    scene, o_f2f, o_ba, cfg = _replays()
    gt = scene.poses[1:, :3, 3]
    r_f2f, _ = ate_rmse(o_f2f.T_world[1:, :3, 3], gt)
    r_ba, _ = ate_rmse(o_ba.vo.T_world[1:, :3, 3], gt)
    assert bool(jnp.all(o_ba.vo.pose_ok[1:]))
    assert float(r_ba) < 0.05
    assert float(r_ba) < float(r_f2f), (float(r_ba), float(r_f2f))


def test_ba_pipeline_map_lifecycle():
    scene, _, o_ba, cfg = _replays()
    kf = np.asarray(o_ba.is_keyframe)
    assert kf.sum() == (F + cfg.keyframe_every - 1) // cfg.keyframe_every
    n_lm = np.asarray(o_ba.n_landmarks)
    assert n_lm.max() <= cfg.ba.max_landmarks
    assert n_lm[-1] == cfg.ba.max_landmarks  # map saturates and recycles
    # BA ran on keyframes once the window had >= 2 keyframes.
    cost = np.asarray(o_ba.ba_cost)
    assert (cost[kf][2:] > 0).all()
