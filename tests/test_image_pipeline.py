"""Golden integration test: image-mode VO (config c2 frontend path).

Renders a synthetic room sequence through the exact sensor model and runs the
FULL image pipeline -- panorama warp, Harris+BRIEF, stereo+temporal Hamming
matching, triangulation, RANSAC, bearing refine -- as one jitted scan
(BASELINE.json:8; SURVEY.md section 4.2 "full-image path tested on a small
procedurally textured scene").
"""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.eval.ate import ate_rmse
from sosvo.frontend.image_frontend import build_frontend_luts, extract_observations
from sosvo.sensor.rig import default_rig
from sosvo.synth.render import RoomScene, render_sequence
from sosvo.synth.scene import make_trajectory
from sosvo.utils.config import FrontendConfig, PipelineConfig, RansacConfig
from sosvo.vo.image_pipeline import run_replay_images
from sosvo.vo.state import init_track_state

ROOM = RoomScene(radius=3.0, floor_z=-1.2, ceiling_z=1.6, texture_scale=2.0)
FE = FrontendConfig(max_features=384, pano_height=96, pano_width=768,
                    descriptor_patch=16)
RC = RansacConfig(rigid_angle_threshold=0.02, essential_threshold=0.01,
                  min_inliers=8)


def test_image_mode_tracks_rendered_sequence():
    rig = default_rig(image_size=768)
    n_frames = 6
    poses = make_trajectory(n_frames, radius=0.4)
    imgs = jax.jit(lambda P: render_sequence(rig, P, ROOM))(poses)

    cfg = PipelineConfig(frontend=FE, ransac=RC)
    luts = build_frontend_luts(rig, FE)
    state = init_track_state(FE.max_features, jax.random.PRNGKey(2), T0=poses[0])
    replay = jax.jit(lambda s, im: run_replay_images(rig, cfg, s, im, luts=luts))
    final, outs = replay(state, imgs)

    assert bool(jnp.all(outs.pose_ok[1:])), np.asarray(outs.n_inliers)
    assert int(jnp.min(outs.n_stereo)) > 100
    assert int(jnp.min(outs.n_inliers[1:])) > 50
    rmse, _ = ate_rmse(outs.T_world[1:, :3, 3], poses[1:, :3, 3])
    assert float(rmse) < 0.02, float(rmse)


def test_image_mode_with_windowed_ba():
    """c2 proper: full frontend + keyframed robust BA, one jitted scan."""
    from sosvo.utils.config import BAConfig
    from sosvo.vo.ba_pipeline import init_ba_state, run_replay_ba
    from sosvo.frontend.image_frontend import extract_observations

    rig = default_rig(image_size=768)
    n_frames = 10
    poses = make_trajectory(n_frames, radius=0.4)
    imgs = jax.jit(lambda P: render_sequence(rig, P, ROOM))(poses)
    cfg = PipelineConfig(frontend=FE, ransac=RC,
                         ba=BAConfig(max_landmarks=384, huber_delta=0.003))
    luts = build_frontend_luts(rig, FE)
    extract = jax.jit(jax.vmap(lambda im: extract_observations(rig, luts, FE, im)))
    obs = extract(imgs)
    state = init_ba_state(cfg, jax.random.PRNGKey(2), T0=poses[0])
    final, outs = jax.jit(lambda s, o: run_replay_ba(rig, cfg, s, o))(state, obs)
    assert bool(jnp.all(outs.vo.pose_ok[1:]))
    rmse, _ = ate_rmse(outs.vo.T_world[1:, :3, 3], poses[1:, :3, 3])
    assert float(rmse) < 0.02, float(rmse)


def test_frontend_observations_geometrically_consistent():
    """Detected features lift to rays that agree with the raw-pixel lift."""
    rig = default_rig(image_size=768)
    poses = make_trajectory(1)
    imgs = jax.jit(lambda P: render_sequence(rig, P, ROOM))(poses)
    luts = build_frontend_luts(rig, FE)
    obs = jax.jit(lambda im: extract_observations(rig, luts, FE, im))(imgs[0])
    assert int(obs.valid_top.sum()) > 200
    assert int(obs.valid_bottom.sum()) > 200
    # Unit rays.
    n = jnp.linalg.norm(obs.ray_top, axis=-1)
    assert float(jnp.max(jnp.abs(jnp.where(obs.valid_top, n, 1.0) - 1.0))) < 1e-5
