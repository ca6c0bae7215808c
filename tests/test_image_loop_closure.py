"""Image-native loop closure (config c3 path, VERDICT r1 item 3): rendered
omni images -> full frontend -> VO replay -> loop detection on
image-extracted observations -> PGO refinement. Covers the composition the
c3 preset runs on-chip, at test-sized shapes on CPU.
"""

import jax
import jax.numpy as jnp

from sosvo.eval.ate import ate_rmse
from sosvo.frontend.image_frontend import build_frontend_luts, extract_observations
from sosvo.sensor.rig import default_rig
from sosvo.synth.render import RoomScene, render_sequence
from sosvo.synth.scene import make_trajectory
from sosvo.utils.config import FrontendConfig, PipelineConfig, RansacConfig
from sosvo.vo.loop_closure import detect_loops, pgo_refine_trajectory
from sosvo.vo.pipeline import run_replay
from sosvo.vo.state import init_track_state

ROOM = RoomScene(radius=3.0, floor_z=-1.2, ceiling_z=1.6, texture_scale=2.0)
FE = FrontendConfig(max_features=384, pano_height=96, pano_width=768,
                    descriptor_patch=16)
RC = RansacConfig(rigid_angle_threshold=0.02, essential_threshold=0.01,
                  min_inliers=8)
F = 24


def test_image_mode_loop_closure_end_to_end():
    rig = default_rig(image_size=768)
    poses = make_trajectory(F, radius=0.4)   # closed circle: real loops exist
    imgs = jax.jit(lambda P: render_sequence(rig, P, ROOM))(poses)
    cfg = PipelineConfig(frontend=FE, ransac=RC, keyframe_every=4)

    luts = build_frontend_luts(rig, FE)
    extract = jax.jit(jax.vmap(lambda im: extract_observations(rig, luts, FE, im)))
    obs = extract(imgs)

    state = init_track_state(FE.max_features, jax.random.PRNGKey(2), T0=poses[0])
    _, outs = jax.jit(lambda s, o: run_replay(rig, cfg, s, o))(state, obs)
    assert bool(jnp.all(outs.pose_ok[1:]))

    # Loop detection directly on the image-extracted keyframe observations,
    # through the signature prescreen (the c3 preset's configuration).
    kf = jax.tree.map(lambda x: x[:: cfg.keyframe_every], obs)
    _, _, _, w = jax.jit(lambda o: detect_loops(
        rig, cfg, o, min_gap=3, min_inliers=20, max_candidates=6))(kf)
    n_edges = int(jnp.sum((w > 0).astype(jnp.int32)))
    assert n_edges >= 1, "no loop edges from image-extracted features"

    # Full refinement: must not degrade an already-good trajectory, and must
    # stay tight in absolute terms.
    T_pgo, n_loops = jax.jit(lambda o, T: pgo_refine_trajectory(
        rig, cfg, o, T, min_gap=3, min_inliers=20, max_candidates=6))(
        obs, outs.T_world)
    assert int(n_loops) >= 1
    gt = poses[1:, :3, 3]
    r_vo, _ = ate_rmse(outs.T_world[1:, :3, 3], gt)
    r_pgo, _ = ate_rmse(T_pgo[1:, :3, 3], gt)
    assert float(r_pgo) < 0.03, float(r_pgo)
    assert float(r_pgo) < 1.5 * float(r_vo) + 1e-4, (float(r_pgo), float(r_vo))
