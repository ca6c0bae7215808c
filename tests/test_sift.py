"""SIFT-parity frontend option: 128-d float descriptor + L2 MXU matcher.

The reference exposes SIFT as an alternative to ORB through OpenCV
(SURVEY.md C6 "ORB default; SIFT/AKAZE options"); this is the TPU-native
equivalent — one fused 18×18 gather per keypoint, trilinear orientation
histograms, and Gram-trick L2 matching on the MXU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.frontend.descriptor import SIFT_DIM, describe_sift
from sosvo.frontend.detect import Keypoints, detect
from sosvo.frontend.match import l2_matrix_mxu, match


def _texture(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)).astype(np.float32)
    # Smooth a little so gradients are informative, not pixel noise.
    for ax in (0, 1):
        img = (np.roll(img, 1, ax) + img + np.roll(img, -1, ax)) / 3.0
    return jnp.asarray(img)


def _kps(rows, cols):
    k = len(rows)
    return Keypoints(rows=jnp.asarray(rows, jnp.float32),
                     cols=jnp.asarray(cols, jnp.float32),
                     response=jnp.ones((k,), jnp.float32),
                     valid=jnp.ones((k,), bool))


def test_sift_shape_norm_and_jit():
    img = _texture()
    kps = _kps([30.0, 40.0, 55.5], [40.0, 70.0, 90.25])
    d = jax.jit(lambda im: describe_sift(im, kps))(img)
    assert d.shape == (3, SIFT_DIM) and d.dtype == jnp.float32
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)
    # Histogram is clipped at 0.2 BEFORE the final renormalization, so the
    # output can slightly exceed 0.2 but stays bounded well below unclipped.
    assert float(jnp.max(d)) <= 0.3


def test_sift_translation_matching_recovers_identity():
    """Descriptors at the same scene point in a shifted image match 1:1."""
    img = _texture()
    dy, dx = 3, 5
    shifted = jnp.roll(jnp.roll(img, dy, 0), dx, 1)
    rows = np.linspace(25, 70, 12)
    cols = np.linspace(20, 100, 12)
    da = describe_sift(img, _kps(rows, cols))
    db = describe_sift(shifted, _kps(rows + dy, cols + dx))
    valid = jnp.ones((12,), bool)
    m = match(da, db, valid, valid, max_distance=0.7, ratio=0.9, metric="l2")
    assert bool(jnp.all(m.valid)), np.asarray(m.dist)
    np.testing.assert_array_equal(np.asarray(m.idx_b), np.arange(12))


def test_sift_rotation_invariance_with_angles():
    """A 90°-rotated image + the true patch angle gives the same descriptor."""
    img = _texture(96, 96, seed=3)
    rot = jnp.asarray(np.rot90(np.asarray(img)))  # CCW: (r, c) -> (N-1-c, r)
    n = img.shape[0]
    rows = np.array([40.0, 52.0, 61.0])
    cols = np.array([37.0, 55.0, 44.0])
    d0 = describe_sift(img, _kps(rows, cols), angles=jnp.zeros(3))
    # Under np.rot90 the point (r, c) maps to (n-1-c, r); in the (row-down)
    # patch frame the IC_Angle convention measures this as a -90° rotation,
    # so steering with angle = -pi/2 must undo it (same sign the measured
    # orientation() would produce). Residual ~0.3 comes from integer-pixel
    # sample rounding on the noise texture; matching pairs sit < 0.45, well
    # inside the 0.7 acceptance threshold.
    d1 = describe_sift(rot, _kps(n - 1 - cols, rows),
                       angles=jnp.full((3,), -jnp.pi / 2))
    dist = np.linalg.norm(np.asarray(d0) - np.asarray(d1), axis=1)
    assert (dist < 0.45).all(), dist


def test_l2_matrix_matches_direct():
    rng = np.random.default_rng(1)
    a = rng.random((7, SIFT_DIM)).astype(np.float32)
    b = rng.random((9, SIFT_DIM)).astype(np.float32)
    got = np.asarray(l2_matrix_mxu(jnp.asarray(a), jnp.asarray(b)))
    want = np.linalg.norm(a[:, None] - b[None, :], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_image_mode_tracks_with_sift(room_seq):
    """End-to-end c2 replay with descriptor='sift' (frontend option parity)."""
    from sosvo.eval.ate import ate_rmse
    from sosvo.frontend.image_frontend import build_frontend_luts
    from sosvo.utils.config import FrontendConfig, PipelineConfig, RansacConfig
    from sosvo.vo.image_pipeline import run_replay_images
    from sosvo.vo.state import init_track_state

    rig, poses, imgs = room_seq
    fe = FrontendConfig(max_features=384, pano_height=96, pano_width=768,
                        descriptor_patch=16, descriptor="sift")
    cfg = PipelineConfig(frontend=fe,
                         ransac=RansacConfig(rigid_angle_threshold=0.02,
                                             essential_threshold=0.01,
                                             min_inliers=8))
    luts = build_frontend_luts(rig, fe)
    state = init_track_state(fe.max_features, jax.random.PRNGKey(2),
                             T0=poses[0], descriptor="sift")
    final, outs = jax.jit(
        lambda s, im: run_replay_images(rig, cfg, s, im, luts=luts)
    )(state, imgs)
    assert bool(jnp.all(outs.pose_ok[1:])), np.asarray(outs.n_inliers)
    assert int(jnp.min(outs.n_stereo)) > 80
    rmse, _ = ate_rmse(outs.T_world[1:, :3, 3], poses[1:, :3, 3])
    assert float(rmse) < 0.02, float(rmse)


def test_sift_composes_with_ba_and_loop_closure():
    """End-to-end: rendered images -> SIFT frontend -> windowed-BA replay ->
    loop detection + PGO. Guards the descriptor x stage composition matrix
    (VERDICT r3 weak #2: L2 descriptors used to TypeError at trace inside the
    map-association and loop-edge Hamming matchers)."""
    from sosvo.eval.ate import ate_rmse
    from sosvo.frontend.image_frontend import build_frontend_luts, extract_observations
    from sosvo.sensor.rig import default_rig
    from sosvo.synth.render import RoomScene, render_sequence
    from sosvo.synth.scene import make_trajectory
    from sosvo.utils.config import FrontendConfig, PipelineConfig, RansacConfig
    from sosvo.vo.ba_pipeline import init_ba_state, run_replay_ba
    from sosvo.vo.loop_closure import pgo_refine_trajectory

    rig = default_rig(image_size=768)
    fe = FrontendConfig(max_features=192, pano_height=96, pano_width=768,
                        descriptor_patch=16, descriptor="sift")
    rc = RansacConfig(rigid_angle_threshold=0.02, essential_threshold=0.01,
                      min_inliers=8)
    room = RoomScene(radius=3.0, floor_z=-1.2, ceiling_z=1.6, texture_scale=2.0)
    n_frames = 12
    poses = make_trajectory(n_frames, radius=0.4)
    imgs = jax.jit(lambda P: render_sequence(rig, P, room))(poses)
    cfg = PipelineConfig(frontend=fe, ransac=rc, keyframe_every=3)

    luts = build_frontend_luts(rig, fe)
    extract = jax.jit(jax.vmap(lambda im: extract_observations(rig, luts, fe, im)))
    obs = extract(imgs)
    assert obs.desc_top.dtype == jnp.float32  # the float-descriptor path

    state = init_ba_state(cfg, jax.random.PRNGKey(2), T0=poses[0])
    _, outs = jax.jit(lambda s, o: run_replay_ba(rig, cfg, s, o))(state, obs)
    assert bool(jnp.all(outs.vo.pose_ok[1:])), np.asarray(outs.vo.n_inliers)
    assert int(jnp.sum(outs.is_keyframe.astype(jnp.int32))) >= 3
    gt = poses[1:, :3, 3]
    r_ba, _ = ate_rmse(outs.vo.T_world[1:, :3, 3], gt)
    assert np.isfinite(float(r_ba)) and float(r_ba) < 0.05, float(r_ba)

    # Loop closure + PGO on the same SIFT observations (L2 loop-edge match).
    T_pgo, n_loops = jax.jit(lambda o, T: pgo_refine_trajectory(
        rig, cfg, o, T, min_gap=3, min_inliers=15, max_candidates=6))(
        obs, outs.vo.T_world)
    r_pgo, _ = ate_rmse(T_pgo[1:, :3, 3], gt)
    assert np.isfinite(float(r_pgo)), float(r_pgo)
    assert float(r_pgo) < 1.5 * float(r_ba) + 1e-4, (float(r_pgo), float(r_ba))
