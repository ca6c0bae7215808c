"""Chessboard corner detection from raw omni images (host-side).

Closes the calibration loop from PIXELS (SURVEY.md C16; VERDICT r3 missing
#3): the reference toolchain goes image -> corners -> GUM parameters, where
corner extraction is an OpenCV call. This is an original host-side
implementation (numpy/scipy are fine OFF the product path -- calibration is
an offline side-chain, SURVEY.md section 7):

  1. saddle detection: chessboard X-corners are saddle points of intensity,
     so det(Hessian) < 0 with large magnitude; non-max suppression +
     quadratic subpixel refinement on the response surface;
  2. lattice growing: breadth-first integer-coordinate assignment with
     locally extrapolated step vectors, which tolerates the smooth but
     strong warp of catadioptric views (a global homography would not);
  3. symmetry resolution: a grown lattice is known only up to the board's
     dihedral symmetries per view; hypotheses are scored with the rig's own
     stereo geometry (triangulate + Umeyama against the known grid), which
     also rejects the improper (reflected) assignments.

The output is `calib.boards.BoardObservations` -- the exact structure the
staged GUM fit (`fit_rig_full_gum`) consumes, so
images -> board_observations_from_images -> fit -> calib JSON is one chain.
"""

from __future__ import annotations

import numpy as np

from sosvo.calib.boards import BoardObservations, make_board_grid


def _gaussian_smooth_np(img: np.ndarray, sigma: float) -> np.ndarray:
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(img.astype(np.float64), sigma, mode="nearest")


def detect_saddles(
    img: np.ndarray,
    mask: np.ndarray | None = None,
    max_corners: int = 256,
    sigma: float = 1.5,
    rel_threshold: float = 0.12,
    nms_radius: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """((N, 2) subpixel (u, v) saddle points, (N,) strengths), strongest
    first.

    Response = -det(Hessian) of the smoothed image: positive at saddles
    (X-corners), negative at blobs/ridges, so thresholding needs no corner
    template and is rotation invariant -- important because azimuth rotates
    the checker orientation continuously around the omni annulus.
    """
    from scipy.ndimage import maximum_filter

    g = _gaussian_smooth_np(img, sigma)
    gy, gx = np.gradient(g)
    gxy, gxx = np.gradient(gx)
    gyy, _ = np.gradient(gy)
    resp = gxy * gxy - gxx * gyy               # -det(H) > 0 at saddles
    if mask is not None:
        resp = np.where(mask, resp, 0.0)
    peak = (resp == maximum_filter(resp, size=2 * nms_radius + 1)) \
        & (resp > rel_threshold * resp.max())
    vs, us = np.nonzero(peak)
    order = np.argsort(resp[vs, us])[::-1][:max_corners]
    vs, us = vs[order], us[order]

    # Subpixel: quadratic fit of the response surface in the 3x3 patch.
    h, w = resp.shape
    out = []
    for v, u in zip(vs, us):
        if 1 <= v < h - 1 and 1 <= u < w - 1:
            p = resp[v - 1:v + 2, u - 1:u + 2]
            du = 0.5 * (p[1, 2] - p[1, 0])
            dv = 0.5 * (p[2, 1] - p[0, 1])
            duu = p[1, 2] - 2 * p[1, 1] + p[1, 0]
            dvv = p[2, 1] - 2 * p[1, 1] + p[0, 1]
            duv = 0.25 * (p[2, 2] - p[2, 0] - p[0, 2] + p[0, 0])
            det = duu * dvv - duv * duv
            if abs(det) > 1e-12:
                ou = -(dvv * du - duv * dv) / det
                ov = -(duu * dv - duv * du) / det
                if abs(ou) < 1.0 and abs(ov) < 1.0:
                    out.append((u + ou, v + ov))
                    continue
        out.append((float(u), float(v)))
    return (np.asarray(out, np.float64).reshape(-1, 2),
            resp[vs, us].astype(np.float64))


def grow_grid(pts: np.ndarray, nx: int, ny: int,
              strengths: np.ndarray | None = None) -> np.ndarray | None:
    """Assign lattice coordinates to detected saddle points.

    Returns (nx, ny, 3): [:, :, :2] = (u, v), [:, :, 2] = found flag; or
    None when no (nx, ny)-compatible lattice emerges. Orientation is
    arbitrary (resolved later against the rig's stereo geometry).

    BFS with LOCALLY EXTRAPOLATED steps: the prediction for cell (i+1, j) is
    2 p(i, j) - p(i-1, j) (or a nearby parallel edge when there is no
    opposite neighbor), so the lattice follows the annulus curvature --
    steps rotate gradually and a global basis would drift off within a few
    cells on an omni image.

    An OVERSIZED lattice (the border squares' T-junctions are
    lattice-consistent one-square continuations of the inner X-corners, so
    the BFS happily annexes them) is trimmed to the (nx, ny) subwindow with
    the largest summed saddle `strengths` -- true X-corners respond far
    stronger than border T-corners, so the inner grid wins.
    """
    n = len(pts)
    if n < 4:
        return None
    centroid = pts.mean(axis=0)
    seed = int(np.argmin(np.linalg.norm(pts - centroid, axis=1)))
    d_seed = np.linalg.norm(pts - pts[seed], axis=1)
    order = np.argsort(d_seed)
    n1 = int(order[1])
    u_vec = pts[n1] - pts[seed]
    vi = None
    for cand in order[2:]:
        wv = pts[cand] - pts[seed]
        cosang = abs(np.dot(u_vec, wv)) / (np.linalg.norm(u_vec) * np.linalg.norm(wv) + 1e-12)
        ratio = np.linalg.norm(wv) / (np.linalg.norm(u_vec) + 1e-12)
        if cosang < 0.7 and 0.25 < ratio < 4.0:
            vi = int(cand)
            break
    if vi is None:
        return None

    grid = {(0, 0): seed, (1, 0): n1, (0, 1): vi}
    used = {seed, n1, vi}
    changed = True
    while changed:
        changed = False
        for (i, j), idx in list(grid.items()):
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                tgt = (i + di, j + dj)
                if tgt in grid:
                    continue
                opp = (i - di, j - dj)
                if opp in grid:
                    step = pts[idx] - pts[grid[opp]]
                else:
                    step = None
                    for (pi, pj), pidx in grid.items():
                        q = (pi + di, pj + dj)
                        if q in grid and abs(pi - i) + abs(pj - j) <= 2:
                            step = pts[grid[q]] - pts[pidx]
                            break
                    if step is None:
                        continue
                pred = pts[idx] + step
                tol = 0.35 * np.linalg.norm(step)
                d = np.linalg.norm(pts - pred, axis=1)
                d[list(used)] = np.inf
                best = int(np.argmin(d))
                if d[best] < tol:
                    grid[tgt] = best
                    used.add(best)
                    changed = True

    if strengths is None:
        strengths = np.ones(n)
    ii = np.asarray([k[0] for k in grid])
    jj = np.asarray([k[1] for k in grid])
    ii -= ii.min()
    jj -= jj.min()
    di, dj = ii.max() + 1, jj.max() + 1
    full = np.zeros((di, dj, 3))
    s_full = np.zeros((di, dj))
    for (key, idx), i2, j2 in zip(grid.items(), ii, jj):
        full[i2, j2, :2] = pts[idx]
        full[i2, j2, 2] = 1.0
        s_full[i2, j2] = strengths[idx]
    # Strongest (nx, ny) subwindow over BOTH orientations (the border ring
    # can pad the lattice square -- e.g. a 4x5 true block inside 6x6 -- so
    # the transpose decision belongs to the window search, not the raw dims).
    #
    # Scoring (three measured failure modes shaped this):
    #   + count of STRONG cells -- true X-corners cluster ~4x stronger than
    #     the pattern-border T-junction saddles (0.012-0.013 vs 0.003);
    #   - penalty for WEAK-filled cells: a border saddle inside the window
    #     means the window overruns the pattern edge (the border row sits
    #     exactly one square outside the inner corners, ON the board plane,
    #     so no downstream geometric check can catch the mislabeling);
    #   o the search range is PADDED one cell beyond the grown extent: when
    #     a whole corner row is clipped by the annulus mask (measured on a
    #     board at the elevation limit), the correct window extends into
    #     empty cells on the clipped side -- empty must beat border-filled,
    #     and the pad makes that window exist at all.
    member_s = s_full[s_full > 0]
    thr = 0.6 * float(np.median(member_s)) if member_s.size else 0.0
    total_s = float(s_full.sum()) + 1e-12
    pad = 1
    sp = np.zeros((di + 2 * pad, dj + 2 * pad))
    sp[pad:pad + di, pad:pad + dj] = s_full
    fp = np.zeros((di + 2 * pad, dj + 2 * pad, 3))
    fp[pad:pad + di, pad:pad + dj] = full
    best = None
    for wx, wy, transpose in ((nx, ny, False), (ny, nx, True)):
        if di + 2 * pad < wx or dj + 2 * pad < wy:
            continue
        for oi in range(di + 2 * pad - wx + 1):
            for oj in range(dj + 2 * pad - wy + 1):
                swin = sp[oi:oi + wx, oj:oj + wy]
                strong = swin > thr
                weak = (swin > 0) & ~strong
                s = (float(strong.sum()) - 0.25 * float(weak.sum())
                     + 0.5 * swin.sum() / total_s)
                if best is None or s > best[0]:
                    best = (s, oi, oj, wx, wy, transpose)
    if best is None:
        return None
    _, oi, oj, wx, wy, transpose = best
    out = fp[oi:oi + wx, oj:oj + wy]
    if transpose:
        out = np.swapaxes(out, 0, 1)
    if out[..., 2].sum() < 0.8 * nx * ny:
        return None
    return out


_SYMMETRIES = ((False, False), (True, False), (False, True), (True, True))


def _apply_sym(g: np.ndarray, flip_i: bool, flip_j: bool) -> np.ndarray:
    if flip_i:
        g = g[::-1]
    if flip_j:
        g = g[:, ::-1]
    return g


def resolve_symmetry(rig, grid_pts, g_top: np.ndarray, g_bot: np.ndarray):
    """Pick the (top, bottom) dihedral orientation pair that the rig's own
    stereo geometry supports: triangulate corners seen in both views and
    Umeyama-fit them to the known board grid; the true (proper) assignment
    fits to sub-mm, reflected (improper) ones cannot (Umeyama returns a
    proper rotation by construction).

    Returns (top grid, bottom grid, residual) where `residual` is the
    weighted mean-squared 3D fit error (m^2) of the winning hypothesis --
    a per-board QUALITY score. A lattice that grew off the board edge onto
    spurious saddles (measured: a one-cell shift in the low-resolution
    bottom view) still wins the ranking but cannot fit the rigid grid;
    callers gate on the residual to drop such boards."""
    import jax.numpy as jnp

    from sosvo.geometry.align import umeyama
    from sosvo.geometry.triangulate import midpoint_triangulate
    from sosvo.sensor.model import lift, viewpoint

    # Lift each view ONCE: a dihedral flip is a pure index permutation of
    # the detections, so the per-hypothesis work is permuting precomputed
    # rays, not re-dispatching lift() 16x per board.
    tops = [_apply_sym(g_top, *s).reshape(-1, 3) for s in _SYMMETRIES]
    bots = [_apply_sym(g_bot, *s).reshape(-1, 3) for s in _SYMMETRIES]
    lift_t = [lift(rig.top, jnp.asarray(g[:, :2], jnp.float32)) for g in tops]
    lift_b = [lift(rig.bottom, jnp.asarray(g[:, :2], jnp.float32)) for g in bots]
    c_t = viewpoint(rig.top)
    c_b = viewpoint(rig.bottom)

    best = None
    for gt_, (ray_t, ok_t) in zip(tops, lift_t):
        for gb_, (ray_b, ok_b) in zip(bots, lift_b):
            w = (gt_[:, 2] * gb_[:, 2]).astype(np.float32)
            if w.sum() < 6:
                continue
            tri = midpoint_triangulate(
                ray_t, ray_b,
                jnp.broadcast_to(c_t, ray_t.shape),
                jnp.broadcast_to(c_b, ray_b.shape))
            ww = jnp.asarray(w) * ok_t * ok_b * tri.valid
            T, _ = umeyama(grid_pts, tri.points, weights=ww)
            fit = jnp.einsum("ij,gj->gi", T[:3, :3], grid_pts) + T[:3, 3]
            res = jnp.sum(jnp.sum((fit - tri.points) ** 2, -1) * ww) / \
                jnp.maximum(jnp.sum(ww), 1e-9)
            res = float(res)
            if best is None or res < best[0]:
                best = (res, gt_, gb_)
    if best is None:
        return None
    return best[1], best[2], best[0]


def board_observations_from_images(
    rig,
    images: np.ndarray,
    nx: int = 5,
    ny: int = 4,
    square: float = 0.07,
    erode_annulus: int = 4,
    board_residual_ratio: float = 4.0,
) -> BoardObservations | None:
    """(M, H, W) raw omni board captures -> BoardObservations, or None if
    NO board passes detection + quality gating.

    Each image contains the SAME board twice (inner annulus = bottom mirror,
    outer = top); detection runs per view on the annulus-masked image so the
    two lattices never merge across the view boundary.

    Boards whose winning symmetry hypothesis fits the rigid grid worse than
    `board_residual_ratio` x the median board's residual are DROPPED, not
    fatal: a lattice that grew one cell off the board edge is a coherent
    20-corner outlier that robust per-corner weighting cannot reject
    (measured: it dragged the bottom view's fit to fx +33%, z_offset -0.28).
    The gate is RELATIVE because the absolute residual floor scales with how
    wrong the prior rig is (the prior is all a real calibration run has);
    measured separation: good boards 2e-4..1e-3 m^2, shifted lattices
    5e-3..2e-2 under a prior ~30 px off. Real calibration sessions simply
    discard such captures.
    """
    import jax.numpy as jnp
    from scipy.ndimage import binary_erosion

    from sosvo.sensor.model import annulus_mask

    h, w = images.shape[-2:]
    masks = {}
    for name, view in (("top", rig.top), ("bottom", rig.bottom)):
        m = np.asarray(annulus_mask(view, h, w))
        masks[name] = binary_erosion(m, iterations=erode_annulus)

    grid_pts = make_board_grid(nx, ny, square)
    g = nx * ny
    cands = []
    for img in np.asarray(images):
        grids = {}
        for name in ("top", "bottom"):
            pts, strengths = detect_saddles(img, masks[name], max_corners=4 * g)
            grids[name] = grow_grid(pts, nx, ny, strengths)
        if grids["top"] is None or grids["bottom"] is None:
            continue  # board dropped
        resolved = resolve_symmetry(rig, grid_pts, grids["top"], grids["bottom"])
        if resolved is None:
            continue
        cands.append(resolved)
    if not cands:
        return None
    med = float(np.median([res for _, _, res in cands]))
    kept = [(gt_, gb_) for gt_, gb_, res in cands
            if res <= board_residual_ratio * max(med, 1e-12)]
    if not kept:
        return None
    uv_t = [gt_[:, :2] for gt_, _ in kept]
    w_t = [gt_[:, 2] for gt_, _ in kept]
    uv_b = [gb_[:, :2] for _, gb_ in kept]
    w_b = [gb_[:, 2] for _, gb_ in kept]
    # Only surviving boards are kept (dropped ones would otherwise leave
    # zero-weight pose blocks whose garbage closed-form inits can reach the
    # residuals as NaN * 0).
    return BoardObservations(
        pts_board=grid_pts,
        uv_top=jnp.asarray(np.stack(uv_t), jnp.float32),
        w_top=jnp.asarray(np.stack(w_t), jnp.float32),
        uv_bottom=jnp.asarray(np.stack(uv_b), jnp.float32),
        w_bottom=jnp.asarray(np.stack(w_b), jnp.float32))
