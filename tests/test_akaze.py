"""AKAZE option (SURVEY.md C6): nonlinear scale space, M-LDB descriptors,
and end-to-end image-mode tracking with descriptor="akaze"."""

import jax
import jax.numpy as jnp

from sosvo.eval.ate import ate_rmse
from sosvo.frontend.akaze import extract_akaze, nonlinear_scale_space
from sosvo.frontend.detect import gaussian_smooth
from sosvo.frontend.image_frontend import build_frontend_luts
from sosvo.frontend.match import match
from sosvo.sensor.rig import default_rig
from sosvo.synth.render import RoomScene, render_sequence
from sosvo.synth.scene import make_trajectory
from sosvo.utils.config import FrontendConfig, PipelineConfig, RansacConfig
from sosvo.vo.image_pipeline import run_replay_images
from sosvo.vo.state import init_track_state


def _textured(key, h=96, w=256):
    img = jax.random.uniform(key, (h, w))
    return gaussian_smooth(gaussian_smooth(img))


def test_diffusion_preserves_edges_more_than_gaussian():
    """Perona-Malik is edge-stopping: after equal smoothing effort, a step
    edge stays sharper than under linear (Gaussian) diffusion."""
    h, w = 64, 128
    img = jnp.where(jnp.arange(w)[None, :] < w // 2, 0.0, 1.0)
    img = jnp.broadcast_to(img, (h, w)).astype(jnp.float32)
    img = img + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (h, w))
    space = nonlinear_scale_space(img, n_levels=4)
    nl = space[-1]
    lin = img
    for _ in range(8):
        lin = gaussian_smooth(lin)
    mid = w // 2
    edge_nl = float(jnp.mean(nl[:, mid + 2] - nl[:, mid - 3]))
    edge_lin = float(jnp.mean(lin[:, mid + 2] - lin[:, mid - 3]))
    assert edge_nl > edge_lin + 0.05, (edge_nl, edge_lin)


def test_mldb_descriptors_match_under_azimuth_shift():
    img = _textured(jax.random.PRNGKey(1))
    kps, desc = jax.jit(lambda im: extract_akaze(im, 128))(img)
    assert int(kps.valid.sum()) > 100
    img2 = jnp.roll(img, 7, axis=1)
    kps2, desc2 = jax.jit(lambda im: extract_akaze(im, 128))(img2)
    m = match(desc, desc2, kps.valid, kps2.valid, max_distance=80.0, ratio=0.9)
    ok = m.valid
    assert int(ok.sum()) > 80
    dc = jnp.mod(kps2.cols[m.idx_b] - kps.cols, float(img.shape[1]))
    consistent = jnp.abs(dc - 7.0) < 1.5
    frac = float(jnp.sum((consistent & ok).astype(jnp.float32)) /
                 jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0))
    assert frac > 0.9, frac


def test_image_mode_tracks_with_akaze():
    """Full image-mode VO with the AKAZE frontend option."""
    rig = default_rig(image_size=768)
    fe = FrontendConfig(max_features=384, pano_height=96, pano_width=768,
                        descriptor_patch=16, descriptor="akaze")
    rc = RansacConfig(rigid_angle_threshold=0.02, essential_threshold=0.01,
                      min_inliers=8)
    room = RoomScene(radius=3.0, floor_z=-1.2, ceiling_z=1.6, texture_scale=2.0)
    n_frames = 5
    poses = make_trajectory(n_frames, radius=0.4)
    imgs = jax.jit(lambda P: render_sequence(rig, P, room))(poses)
    cfg = PipelineConfig(frontend=fe, ransac=rc)
    luts = build_frontend_luts(rig, fe)
    state = init_track_state(fe.max_features, jax.random.PRNGKey(2), T0=poses[0])
    _, outs = jax.jit(lambda s, im: run_replay_images(rig, cfg, s, im, luts=luts))(
        state, imgs)
    assert bool(jnp.all(outs.pose_ok[1:])), outs.n_inliers
    rmse, _ = ate_rmse(outs.T_world[1:, :3, 3], poses[1:, :3, 3])
    assert float(rmse) < 0.03, float(rmse)
