"""Loop closure + PGO over a replayed noisy trajectory (config c3 path)."""

import jax
import jax.numpy as jnp

from sosvo.eval.ate import ate_rmse
from sosvo.sensor.rig import default_rig
from sosvo.synth.scene import make_scene, observe_sequence
from sosvo.utils.config import PipelineConfig
from sosvo.vo.loop_closure import detect_loops, pgo_refine_trajectory
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


def test_pgo_refinement_reduces_drift():
    rig, cfg, scene, obs, outs = _noisy_replay()
    T_vo = outs.T_world
    T_pgo, n_loops = jax.jit(
        lambda o, T: pgo_refine_trajectory(rig, cfg, o, T, min_gap=3, min_inliers=30)
    )(obs, T_vo)
    assert int(n_loops) > 3, int(n_loops)

    gt = scene.poses[1:, :3, 3]
    r_vo, _ = ate_rmse(T_vo[1:, :3, 3], gt)
    r_pgo, _ = ate_rmse(T_pgo[1:, :3, 3], gt)
    assert float(r_pgo) < float(r_vo), (float(r_pgo), float(r_vo))
    assert float(r_pgo) < 0.05


def test_prefiltered_loops_match_all_pairs():
    """Signature prescreen (VERDICT r1 item 4): with M = 2x the number of true
    loops, the top-M candidates recover (at least) the all-pairs loop set and
    the PGO result is as good."""
    from sosvo.vo.loop_closure import keyframe_signatures, select_loop_candidates

    rig, cfg, scene, obs, outs = _noisy_replay()
    T_vo = outs.T_world

    kf = jax.tree.map(lambda x: x[:: cfg.keyframe_every], obs)
    li_all, lj_all, _, w_all = jax.jit(
        lambda o: detect_loops(rig, cfg, o, min_gap=3, min_inliers=30))(kf)
    n_true = int(jnp.sum((w_all > 0).astype(jnp.int32)))
    assert n_true > 3

    M = 2 * n_true
    li_m, lj_m, _, w_m = jax.jit(
        lambda o: detect_loops(rig, cfg, o, min_gap=3, min_inliers=30,
                               max_candidates=M))(kf)
    found_all = {(int(a), int(b)) for a, b, w in zip(li_all, lj_all, w_all) if float(w) > 0}
    found_m = {(int(a), int(b)) for a, b, w in zip(li_m, lj_m, w_m) if float(w) > 0}
    recall = len(found_m & found_all) / len(found_all)
    assert recall >= 0.8, (recall, len(found_all), len(found_m))

    # End-to-end: prefiltered PGO refinement still beats raw VO.
    from sosvo.eval.ate import ate_rmse
    T_pgo, n_loops = jax.jit(
        lambda o, T: pgo_refine_trajectory(rig, cfg, o, T, min_gap=3,
                                           min_inliers=30, max_candidates=M)
    )(obs, T_vo)
    gt = scene.poses[1:, :3, 3]
    r_vo, _ = ate_rmse(T_vo[1:, :3, 3], gt)
    r_pgo, _ = ate_rmse(T_pgo[1:, :3, 3], gt)
    assert float(r_pgo) < float(r_vo)


def test_sharded_loop_detection_matches_single_device(devices8):
    """Pair-sharded detection (P1-DP over candidates) == single-device."""
    from sosvo.dist.loops_dist import detect_loops_sharded
    from sosvo.dist.mesh import data_mesh

    rig, cfg, scene, obs, outs = _noisy_replay()
    kf = jax.tree.map(lambda x: x[:: cfg.keyframe_every], obs)
    ei_1, ej_1, T_1, w_1 = jax.jit(
        lambda o: detect_loops(rig, cfg, o, min_gap=3, min_inliers=30))(kf)
    mesh = data_mesh(8)
    ei_s, ej_s, T_s, w_s = detect_loops_sharded(
        mesh, rig, cfg, kf, min_gap=3, min_inliers=30)
    assert (jnp.asarray(ei_1) == ei_s).all() and (jnp.asarray(ej_1) == ej_s).all()
    # Same RANSAC keys per pair -> same accept decisions; weights may differ
    # by a couple of borderline inliers (f32 reductions reassociate under the
    # sharded layout, flipping threshold-straddling residuals).
    assert bool(jnp.all((w_1 > 0) == (w_s > 0)))
    assert float(jnp.max(jnp.abs(w_1 - w_s))) < 0.15
    accepted = w_1 > 0
    t_diff = jnp.where(accepted,
                       jnp.linalg.norm(T_1[:, :3, 3] - T_s[:, :3, 3], axis=-1),
                       0.0)
    # f32 reassociation under the sharded layout propagates through 4 LM
    # iterations of the two-frame edge BA (accept/reject branches amplify
    # tiny diffs), so exact equality is not expected; what matters for PGO is
    # that every pair yields the same accept decision and a translation
    # within a fraction of the drift the edges exist to correct.
    med = jnp.nanmedian(jnp.where(accepted, t_diff, jnp.nan))
    assert float(jnp.nanmax(jnp.where(accepted, t_diff, jnp.nan))) < 0.05
    assert float(med) < 1e-3, float(med)


def test_detect_loops_rejects_when_unmatchable():
    """Keyframes with disjoint descriptor content must yield no loop edges."""
    rig, cfg, scene, obs, outs = _noisy_replay()
    kf = jax.tree.map(lambda x: x[:: cfg.keyframe_every][:4], obs)
    # Scramble descriptors of half the keyframes -> matching collapses.
    key = jax.random.PRNGKey(9)
    kf = kf._replace(
        desc_top=jax.random.bits(key, kf.desc_top.shape, dtype=jnp.uint32),
        desc_bottom=jax.random.bits(key, kf.desc_bottom.shape, dtype=jnp.uint32),
    )
    _, _, _, w = detect_loops(rig, cfg, kf, min_gap=2, min_inliers=30)
    assert int(jnp.sum((w > 0).astype(jnp.int32))) == 0
