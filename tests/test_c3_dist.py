"""Composed sharded c3: sharded loop detection + time-sharded PGO as ONE path
(`sosvo/dist/c3_dist.py`; SURVEY.md section 5.7, VERDICT r2 item 5).

Parity bar: the sharded refine must match the single-device
`pgo_refine_trajectory` on the same replayed trajectory -- same accepted
loops, same drift reduction, poses equal to solver tolerance (the sharded
solve is GN+PCG vs the single path's default solver, so the comparison is
ATE-level, not bitwise)."""

import jax
import jax.numpy as jnp

from sosvo.dist.c3_dist import pgo_refine_trajectory_sharded
from sosvo.dist.mesh import data_mesh
from sosvo.eval.ate import ate_rmse
from sosvo.sensor.rig import default_rig
from sosvo.synth.scene import make_scene, observe_sequence
from sosvo.utils.config import PipelineConfig
from sosvo.vo.loop_closure import pgo_refine_trajectory
from sosvo.vo.pipeline import run_replay
from sosvo.vo.state import init_track_state

F, K = 48, 384


def _noisy_replay():
    rig = default_rig()
    scene = make_scene(jax.random.PRNGKey(3), n_frames=F, n_landmarks=4096)
    obs = observe_sequence(rig, scene, K, jax.random.PRNGKey(4),
                           pixel_noise=0.4, desc_flip_prob=0.02)
    cfg = PipelineConfig()
    st = init_track_state(K, jax.random.PRNGKey(5), T0=scene.poses[0])
    _, outs = jax.jit(lambda s, o: run_replay(rig, cfg, s, o))(st, obs)
    return rig, cfg, scene, obs, outs


def test_sharded_c3_matches_single_device(devices8):
    rig, cfg, scene, obs, outs = _noisy_replay()
    T_vo = outs.T_world
    kwargs = dict(min_gap=3, min_inliers=30, max_candidates=24, robust="dcs")

    T_1, n_1 = pgo_refine_trajectory(rig, cfg, obs, T_vo, **kwargs)
    mesh = data_mesh(8, devices=devices8)
    T_8, n_8 = pgo_refine_trajectory_sharded(mesh, rig, cfg, obs, T_vo,
                                             **kwargs)

    # Same loop edges accepted (deterministic detection, same keys).
    assert int(n_8) == int(n_1) and int(n_8) > 3, (int(n_8), int(n_1))

    gt = scene.poses[1:, :3, 3]
    r_vo, _ = ate_rmse(T_vo[1:, :3, 3], gt)
    r_1, _ = ate_rmse(T_1[1:, :3, 3], gt)
    r_8, _ = ate_rmse(T_8[1:, :3, 3], gt)
    # Both refine, and the sharded result is as good as the single-device one
    # (12 keyframes pad to 16 nodes on 8 shards -- padding must be inert).
    assert float(r_8) < float(r_vo), (float(r_8), float(r_vo))
    assert float(r_8) <= float(r_1) * 1.05 + 1e-4, (float(r_8), float(r_1))
    # Pose-level agreement between the two solvers.
    diff = float(jnp.max(jnp.linalg.norm(T_8[:, :3, 3] - T_1[:, :3, 3], axis=-1)))
    assert diff < 5e-3, diff


def test_sharded_c3_single_shard_degenerate(devices8):
    """pgo_shards=1 mesh (what the lone real chip runs): same program, one
    device -- must behave exactly like the single-device path."""
    rig, cfg, scene, obs, outs = _noisy_replay()
    T_vo = outs.T_world
    kwargs = dict(min_gap=3, min_inliers=30, max_candidates=24)
    T_1, n_1 = pgo_refine_trajectory(rig, cfg, obs, T_vo, **kwargs)
    mesh = data_mesh(1, devices=devices8[:1])
    T_s, n_s = pgo_refine_trajectory_sharded(mesh, rig, cfg, obs, T_vo,
                                             **kwargs)
    assert int(n_s) == int(n_1)
    gt = scene.poses[1:, :3, 3]
    r_1, _ = ate_rmse(T_1[1:, :3, 3], gt)
    r_s, _ = ate_rmse(T_s[1:, :3, 3], gt)
    assert float(r_s) <= float(r_1) * 1.05 + 1e-4
