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


def _synth_boards(rig, m=6, seed=0, ranges=(1.5,), heights=(-0.25,)):
    """Boards facing the rig, spread in azimuth (and optionally over several
    ranges/heights -- needed to make the full-GUM terms identifiable)."""
    grid = make_board_grid(nx=7, ny=5, square=0.06)
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(m):
        az = 2 * np.pi * i / m
        rr = ranges[i % len(ranges)]
        zz = heights[(i // len(ranges)) % len(heights)]
        # Board center position in the rig frame, inside the stereo band.
        center = np.array([rr * np.cos(az), rr * np.sin(az), zz])
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


def test_joint_fit_recovers_full_gum_terms():
    """Full-GUM joint calibration (r2): distortion + misalignment injected in
    BOTH views come back from a zero-terms init, alongside board poses and
    the baseline."""
    base = default_rig()
    gt = base._replace(
        top=base.top._replace(k1=jnp.float32(-0.015), k2=jnp.float32(8e-4),
                              p1=jnp.float32(4e-4), mis_ry=jnp.float32(0.008)),
        bottom=base.bottom._replace(k1=jnp.float32(0.012),
                                    p2=jnp.float32(-3e-4),
                                    mis_rx=jnp.float32(-0.006)),
    )
    obs, _ = _synth_boards(gt, m=18, seed=5, ranges=(1.0, 1.6, 2.4),
                           heights=(-0.55, -0.25, 0.05))
    from sosvo.calib.boards import fit_rig_full_gum

    res = jax.jit(lambda: fit_rig_full_gum(base, obs))()
    assert float(res.rms0_px) > 0.3, float(res.rms0_px)  # terms material
    assert float(res.rms_px) < 2e-2, float(res.rms_px)
    # Identifiable terms come back as parameters...
    assert abs(float(res.rig.top.mis_ry - gt.top.mis_ry)) < 1e-3
    assert abs(float(res.rig.bottom.mis_rx - gt.bottom.mis_rx)) < 1e-3
    assert abs(float(res.rig.top.p1 - gt.top.p1)) < 3e-4
    # ...while xi/k1 share a radial gauge over a finite band (see
    # fit_rig_full_gum docstring), so the radial terms are validated
    # FUNCTIONALLY: the fitted model must project and lift like the truth
    # on held-out geometry spanning the sampled band.
    import numpy as np
    from sosvo.sensor.model import lift, project, viewpoint

    rng = np.random.default_rng(11)
    az = rng.uniform(-np.pi, np.pi, 800)
    el = rng.uniform(-0.45, 0.05, 800)
    r = rng.uniform(0.9, 2.6, 800)
    pts = jnp.asarray(np.stack([r * np.cos(el) * np.cos(az),
                                r * np.cos(el) * np.sin(az),
                                r * np.sin(el)], -1), jnp.float32)
    for v_fit, v_gt in [(res.rig.top, gt.top), (res.rig.bottom, gt.bottom)]:
        uv_f, ok_f = project(v_fit, pts - viewpoint(v_gt))
        uv_g, ok_g = project(v_gt, pts - viewpoint(v_gt))
        ok = ok_f & ok_g
        px = jnp.where(ok[:, None], uv_f - uv_g, 0.0)
        assert float(jnp.max(jnp.abs(px))) < 0.15, float(jnp.max(jnp.abs(px)))
        ray_f, _ = lift(v_fit, uv_g)
        ray_g, _ = lift(v_gt, uv_g)
        ang = jnp.where(ok, jnp.linalg.norm(ray_f - ray_g, axis=-1), 0.0)
        assert float(jnp.max(ang)) < 1e-3, float(jnp.max(ang))


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
