"""Chessboard rig calibration (C16 toolchain outer loop): joint recovery of
both views' intrinsics + baseline + board poses from corner observations."""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.calib.boards import (BoardObservations, fit_rig_from_boards,
                                init_board_poses, make_board_grid)
from sosvo.geom.lie import se3_exp
from sosvo.sensor.model import project, viewpoint
from sosvo.sensor.rig import default_rig


def _synth_boards(rig, m=6, seed=0):
    """Boards facing the rig from ~1.5 m, spread in azimuth, mild tilt."""
    grid = make_board_grid(nx=7, ny=5, square=0.06)
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(m):
        az = 2 * np.pi * i / m
        # Board center position in the rig frame, inside the stereo band.
        center = np.array([1.5 * np.cos(az), 1.5 * np.sin(az), -0.25])
        # Orient the board's +z (its normal) roughly toward the rig: rotate
        # the z axis onto -center direction, then add a small random twist.
        w = np.array([0.0, 0.0, az + np.pi])  # yaw so the plane faces inward
        tilt = rng.normal(0.0, 0.08, 3)
        T = np.array(se3_exp(jnp.asarray(np.concatenate([w * 0, center]),
                                         jnp.float32)))
        R = np.asarray(se3_exp(jnp.asarray(
            np.concatenate([np.array([np.pi / 2, 0, 0]) + tilt,
                            np.zeros(3)]), jnp.float32)))[:3, :3]
        Rz = np.asarray(se3_exp(jnp.asarray(
            np.concatenate([w, np.zeros(3)]), jnp.float32)))[:3, :3]
        T[:3, :3] = Rz @ R
        poses.append(T)
    poses = jnp.asarray(np.stack(poses), jnp.float32)

    pts_rig = jnp.einsum("mij,gj->mgi", poses[:, :3, :3], grid) \
        + poses[:, None, :3, 3]
    uv_t, ok_t = project(rig.top, pts_rig - viewpoint(rig.top))
    uv_b, ok_b = project(rig.bottom, pts_rig - viewpoint(rig.bottom))
    obs = BoardObservations(pts_board=grid, uv_top=uv_t,
                            w_top=ok_t.astype(jnp.float32),
                            uv_bottom=uv_b, w_bottom=ok_b.astype(jnp.float32))
    return obs, poses


def test_init_board_poses_close():
    rig = default_rig()
    obs, gt_poses = _synth_boards(rig)
    # Enough corners must land in both views for the stereo init to work.
    assert float(jnp.min(jnp.sum(obs.w_top * obs.w_bottom, axis=1))) >= 10
    T0 = init_board_poses(rig, obs)
    err_t = jnp.linalg.norm(T0[:, :3, 3] - gt_poses[:, :3, 3], axis=1)
    assert float(jnp.max(err_t)) < 0.02, np.asarray(err_t)


def test_joint_fit_recovers_intrinsics_and_baseline():
    gt = default_rig()
    obs, _ = _synth_boards(gt)
    init = gt._replace(
        top=gt.top._replace(xi=gt.top.xi * 1.04, fx=gt.top.fx * 0.95,
                            cx=gt.top.cx + 4.0),
        bottom=gt.bottom._replace(fy=gt.bottom.fy * 1.06, cy=gt.bottom.cy - 3.0,
                                  z_offset=gt.bottom.z_offset * 1.15),
    )
    res = jax.jit(lambda: fit_rig_from_boards(init, obs, iters=40))()
    assert float(res.rms0_px) > 1.0
    assert float(res.rms_px) < 5e-2, float(res.rms_px)
    assert abs(float(res.rig.top.xi - gt.top.xi)) < 2e-3
    assert abs(float(res.rig.top.fx - gt.top.fx)) < 0.5
    assert abs(float(res.rig.bottom.cy - gt.bottom.cy)) < 0.1
    # Metric baseline recovered from the board scale (the 15% perturbation
    # must be pulled back to within a millimeter).
    assert abs(float(res.rig.bottom.z_offset - gt.bottom.z_offset)) < 1e-3


def test_noisy_corners_converge_to_noise_floor():
    gt = default_rig()
    obs, _ = _synth_boards(gt, seed=2)
    key = jax.random.PRNGKey(3)
    noisy = obs._replace(
        uv_top=obs.uv_top + 0.2 * jax.random.normal(key, obs.uv_top.shape),
        uv_bottom=obs.uv_bottom + 0.2 * jax.random.normal(
            jax.random.fold_in(key, 1), obs.uv_bottom.shape),
    )
    init = gt._replace(top=gt.top._replace(fx=gt.top.fx * 1.05))
    res = fit_rig_from_boards(init, noisy, iters=40)
    # sqrt(E|r|^2) with 2 components of sigma=0.2 ~= 0.28 px.
    assert float(res.rms_px) < 0.35, float(res.rms_px)
    assert abs(float(res.rig.top.fx - gt.top.fx)) < 1.0
