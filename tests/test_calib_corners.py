"""Calibration from PIXELS (SURVEY.md C16; VERDICT r3 missing #3): rendered
chessboard images -> saddle detection -> lattice growing -> symmetry
resolution -> BoardObservations -> joint rig fit recovers the ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sosvo.calib.boards import fit_rig_from_boards, make_board_grid
from sosvo.calib.corners import (board_observations_from_images, detect_saddles,
                                 grow_grid)
from sosvo.sensor.model import project, viewpoint
from sosvo.sensor.rig import default_rig
from sosvo.synth.board import render_board_frame

NX, NY, SQ = 5, 4, 0.07
IMG = 1536  # calibration captures at high resolution (runtime replay is 768)


def _board_pose(rr, zz, az, tilt=0.0):
    """Board facing the rig: board x along world z (the radial image
    direction), board y azimuthal, normal tilted by `tilt` toward the rig."""
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


def _render_boards(rig, poses):
    render = jax.jit(lambda t: render_board_frame(rig, t, NX, NY, SQ))
    return np.stack([np.asarray(render(jnp.asarray(T))) for T in poses])


def test_saddle_detection_subpixel_accuracy():
    rig = default_rig(image_size=IMG)
    T = _board_pose(0.55, -0.25, 0.3)
    img = _render_boards(rig, [T])[0]
    grid = make_board_grid(NX, NY, SQ)
    pts3 = jnp.einsum("ij,gj->gi", jnp.asarray(T[:3, :3]), grid) \
        + jnp.asarray(T[:3, 3])
    from scipy.ndimage import binary_erosion

    from sosvo.sensor.model import annulus_mask

    for view in (rig.top, rig.bottom):
        m = binary_erosion(np.asarray(annulus_mask(view, IMG, IMG)),
                           iterations=4)
        pts, strengths = detect_saddles(img, m, max_corners=80)
        uv_gt, _ = project(view, pts3 - viewpoint(view))
        d = np.linalg.norm(np.asarray(uv_gt)[:, None] - pts[None], axis=-1)
        nearest = d.min(axis=1)
        # Every true X-corner detected, to sub-quarter-pixel.
        assert (nearest < 0.25).all(), nearest.max()
        lattice = grow_grid(pts, NX, NY, strengths)
        assert lattice is not None
        assert lattice[..., 2].sum() == NX * NY


def test_corner_chain_matches_projection_up_to_board_symmetry():
    """Detected+ordered corners equal the true projections up to the board's
    PROPER symmetry (rot180 in-plane / plane flip-over -- both absorbed by
    the fitted board pose, so calibration is unaffected)."""
    rig = default_rig(image_size=IMG)
    T = _board_pose(0.55, -0.25, 1.1)
    imgs = _render_boards(rig, [T])
    obs = board_observations_from_images(rig, imgs, NX, NY, SQ)
    assert obs is not None
    grid = make_board_grid(NX, NY, SQ)
    pts3 = jnp.einsum("ij,gj->gi", jnp.asarray(T[:3, :3]), grid) \
        + jnp.asarray(T[:3, 3])

    def perm(fi, fj):
        ii, jj = np.meshgrid(np.arange(NX), np.arange(NY), indexing="ij")
        if fi:
            ii = NX - 1 - ii
        if fj:
            jj = NY - 1 - jj
        return (ii * NY + jj).reshape(-1)

    best = np.inf
    for fi in (False, True):
        for fj in (False, True):
            p = perm(fi, fj)
            errs = []
            for view, uv_d in ((rig.top, obs.uv_top[0]),
                               (rig.bottom, obs.uv_bottom[0])):
                uv, _ = project(view, pts3 - viewpoint(view))
                errs.append(np.linalg.norm(
                    np.asarray(uv)[p] - np.asarray(uv_d), axis=1).max())
            best = min(best, max(errs))
    assert best < 0.3, best


def test_rig_recovered_from_board_images():
    """The full pixels-to-parameters loop: images rendered with a PERTURBED
    ground-truth rig, corners detected by the chain, joint fit from the
    nominal prior recovers the perturbation."""
    base = default_rig(image_size=IMG)
    gt = base._replace(
        top=base.top._replace(fx=base.top.fx * 1.02, cx=base.top.cx + 3.0),
        bottom=base.bottom._replace(fy=base.bottom.fy * 0.98,
                                    cy=base.bottom.cy - 2.0,
                                    z_offset=base.bottom.z_offset * 1.08),
    )
    poses = [_board_pose(0.55, -0.25, 2 * np.pi * i / 5, tilt=0.1 * (i % 2))
             for i in range(5)]
    imgs = _render_boards(gt, poses)
    # Detection/ordering uses the NOMINAL prior rig (the truth is unknown to
    # a real calibration run); masks and symmetry scoring only need
    # approximate geometry.
    obs = board_observations_from_images(base, imgs, NX, NY, SQ)
    assert obs is not None, "corner chain failed on a board"
    assert float(jnp.sum(obs.w_top)) >= 0.9 * 5 * NX * NY

    res = jax.jit(lambda: fit_rig_from_boards(base, obs, iters=40))()
    assert float(res.rms0_px) > 1.0          # the perturbation was material
    assert float(res.rms_px) < 0.3, float(res.rms_px)  # detector noise floor
    assert abs(float(res.rig.top.fx - gt.top.fx)) < 1.5
    assert abs(float(res.rig.top.cx - gt.top.cx)) < 1.0
    assert abs(float(res.rig.bottom.fy - gt.bottom.fy)) < 1.5
    assert abs(float(res.rig.bottom.cy - gt.bottom.cy)) < 1.0
    assert abs(float(res.rig.bottom.z_offset - gt.bottom.z_offset)) < 2e-3
