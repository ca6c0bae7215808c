"""Calibration -> VO composition: break the inverse crime (VERDICT r4 #4).

Every other ATE number in the suite is measured with the SAME exact rig the
renderer used. This test closes the real loop (SURVEY.md C16 -> C3 -> C15):

  1. ground truth = a rig perturbed in intrinsics, baseline, DISTORTION and
     mirror-axis MISALIGNMENT (all nonzero);
  2. chessboard captures rendered with that rig at calibration resolution
     (1536), corners detected by the pixel chain, full-GUM staged fit from
     the NOMINAL prior -> fitted rig;
  3. the fitted rig is rescaled to runtime resolution (768,
     `sensor/rig.scale_rig`) and drives image-mode VO on a sequence rendered
     with the GROUND-TRUTH rig;
  4. the fitted-rig ATE must be in the same class as the exact-rig ATE --
     the measured degradation is recorded in BASELINE.md.

Reference parity: the reference pickles its calibration and the VO driver
unpickles it (SURVEY.md section 3.5); its VO also never sees ground-truth
parameters. This is the equivalent end-to-end guarantee.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.calib.boards import fit_rig_full_gum
from sosvo.calib.corners import board_observations_from_images
from sosvo.eval.ate import ate_rmse
from sosvo.frontend.image_frontend import build_frontend_luts
from sosvo.sensor.rig import default_rig, scale_rig
from sosvo.synth.board import render_board_frame
from sosvo.synth.render import RoomScene, render_sequence
from sosvo.synth.scene import make_trajectory
from sosvo.utils.config import FrontendConfig, PipelineConfig, RansacConfig
from sosvo.vo.image_pipeline import run_replay_images
from sosvo.vo.state import init_track_state

NX, NY, SQ = 5, 4, 0.07
CAL_IMG, RUN_IMG = 1536, 768
ROOM = RoomScene(radius=3.0, floor_z=-1.2, ceiling_z=1.6, texture_scale=2.0)
FE = FrontendConfig(max_features=384, pano_height=96, pano_width=768,
                    descriptor_patch=16)
RC = RansacConfig(rigid_angle_threshold=0.02, essential_threshold=0.01,
                  min_inliers=8)


def _ground_truth_rig():
    """Runtime-resolution rig with every fittable term perturbed (xi stays at
    the design prior -- the staged fit freezes it, as real GUM calibration
    does; see calib/boards.fit_rig_full_gum docstring)."""
    base = default_rig(image_size=RUN_IMG)
    top = base.top._replace(
        fx=base.top.fx * 1.02, cx=base.top.cx + 1.5,
        k1=jnp.float32(-0.02), k2=jnp.float32(1e-3),
        p1=jnp.float32(6e-4), p2=jnp.float32(-4e-4),
        mis_rx=jnp.float32(0.012), mis_ry=jnp.float32(-0.009),
    )
    bottom = base.bottom._replace(
        fy=base.bottom.fy * 0.98, cy=base.bottom.cy - 1.0,
        z_offset=base.bottom.z_offset * 1.05,
        k1=jnp.float32(-0.01), p1=jnp.float32(3e-4),
        mis_rx=jnp.float32(-0.006), mis_ry=jnp.float32(0.008),
    )
    return base._replace(top=top, bottom=bottom)


def _board_pose(rr, zz, az, tilt=0.0):
    center = np.array([rr * np.cos(az), rr * np.sin(az), zz])
    nrm = -center / np.linalg.norm(center)
    bx = np.array([0.0, 0.0, 1.0])
    by = np.cross(nrm, bx)
    by /= np.linalg.norm(by)
    bx = np.cross(by, nrm)
    c, s = np.cos(tilt), np.sin(tilt)
    n2 = c * nrm + s * bx
    bx2 = -s * nrm + c * bx
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.stack([bx2, by, n2], axis=1)
    T[:3, 3] = center
    return T


def test_vo_on_fitted_calibration():
    gt_run = _ground_truth_rig()
    gt_cal = scale_rig(gt_run, CAL_IMG / RUN_IMG)

    # --- calibration captures rendered with the (unknown) truth ---
    # A DIVERSE capture set (two radii/heights + tilts): a single same-ring
    # set of 5 leaves the joint problem underconstrained under strong
    # distortion (measured: the fit stalls at rms 2.9 with fx 7% off).
    poses_b = [_board_pose(0.55, -0.25, 2 * np.pi * i / 5, tilt=0.1 * (i % 2))
               for i in range(5)]
    poses_b += [_board_pose(0.50, -0.05, 0.7, tilt=-0.12),
                _board_pose(0.60, -0.35, 1.7),
                _board_pose(0.50, -0.15, 2.8, tilt=-0.1)]
    render = jax.jit(lambda t: render_board_frame(gt_cal, t, NX, NY, SQ))
    imgs_cal = np.stack([np.asarray(render(jnp.asarray(T))) for T in poses_b])

    # --- pixels -> parameters with only the NOMINAL prior ---
    prior = default_rig(image_size=CAL_IMG)
    obs = board_observations_from_images(prior, imgs_cal, NX, NY, SQ)
    assert obs is not None, "corner chain failed on every board"
    assert obs.uv_top.shape[0] >= 6, "board quality gate dropped too many"
    res = jax.jit(lambda: fit_rig_full_gum(prior, obs, iters=50))()
    assert float(res.rms0_px) > 1.0, "perturbation not material at the prior"
    # The weighted rms floor is set by adopted-spurious corners the Huber
    # IRLS down-weights but cannot remove (~2 per board, 10-25 px off);
    # the REAL acceptance criterion is the VO ATE comparison below.
    assert float(res.rms_px) < 3.5, float(res.rms_px)
    fitted = scale_rig(res.rig, RUN_IMG / CAL_IMG)

    # --- VO sequence rendered with the truth, replayed with each rig ---
    n_frames = 6
    poses = make_trajectory(n_frames, radius=0.4)
    imgs = jax.jit(lambda P: render_sequence(gt_run, P, ROOM))(poses)
    cfg = PipelineConfig(frontend=FE, ransac=RC)

    def ate_with(rig):
        luts = build_frontend_luts(rig, FE)
        state = init_track_state(FE.max_features, jax.random.PRNGKey(2),
                                 T0=poses[0])
        replay = jax.jit(
            lambda s, im: run_replay_images(rig, cfg, s, im, luts=luts))
        _, outs = replay(state, imgs)
        assert bool(jnp.all(outs.pose_ok[1:])), np.asarray(outs.n_inliers)
        rmse, _ = ate_rmse(outs.T_world[1:, :3, 3], poses[1:, :3, 3])
        return float(rmse)

    ate_exact = ate_with(gt_run)
    ate_fitted = ate_with(fitted)
    # The fitted rig must land in the same accuracy class as the exact rig:
    # within 3x (or the 2 cm class bound the exact-rig test uses, whichever
    # is looser). Measured values are recorded in BASELINE.md.
    assert ate_fitted < max(3.0 * ate_exact, 0.02), (ate_exact, ate_fitted)
