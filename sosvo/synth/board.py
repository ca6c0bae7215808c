"""Synthetic chessboard renderer through the omnistereo model.

Closes the calibration loop from PIXELS (SURVEY.md C16; VERDICT r3 missing
#3): the reference's toolchain goes image -> chessboard corners -> GUM
parameters, so the test fixture must produce actual board IMAGES through the
same projection model the calibration then recovers. Rendering is the exact
inverse of the corner detector's job: lift every raw-image pixel to its
rig-frame ray (sensor/model.py:lift), intersect the board plane, and shade
the checker parity -- all jitted, 2x2 supersampled for soft edges so the
saddle detector sees realistic anti-aliased corners.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sosvo.geom.lie import mat_inv
from sosvo.sensor.model import annulus_mask, lift, viewpoint
from sosvo.sensor.rig import OmnistereoRig


def _checker(x: jnp.ndarray, y: jnp.ndarray, nx: int, ny: int,
             square: float) -> jnp.ndarray:
    """Checker shade at board-frame (x, y). The board has (nx, ny) INNER
    corners, i.e. (nx+1) x (ny+1) squares centered like
    `calib.boards.make_board_grid`; outside the squares lies a white border
    fading to the background."""
    ix = jnp.floor(x / square + (nx + 1) / 2.0)
    iy = jnp.floor(y / square + (ny + 1) / 2.0)
    inside = ((ix >= 0) & (ix <= nx) & (iy >= 0) & (iy <= ny))
    parity = jnp.mod(ix + iy, 2.0)
    border = ((jnp.abs(x) <= (nx + 1) / 2.0 * square + 0.5 * square)
              & (jnp.abs(y) <= (ny + 1) / 2.0 * square + 0.5 * square))
    return jnp.where(inside, parity, jnp.where(border, 1.0, 0.5))


def render_board_frame(
    rig: OmnistereoRig,
    T_rig_board: jnp.ndarray,
    nx: int = 7,
    ny: int = 5,
    square: float = 0.06,
    background: float = 0.5,
) -> jnp.ndarray:
    """Raw omni image (H, W) of one chessboard at `T_rig_board`.

    Both annular views image the board (inner = bottom mirror, outer = top),
    exactly as the physical sensor composites them (synth/render.py
    convention).
    """
    h, w = rig.image_height, rig.image_width
    X = mat_inv(T_rig_board)                       # board-from-rig
    offs = jnp.asarray([[-0.25, -0.25], [0.25, -0.25],
                        [-0.25, 0.25], [0.25, 0.25]], jnp.float32)

    def shade_view(view):
        vp = viewpoint(view)
        o_b = X[:3, :3] @ vp + X[:3, 3]            # viewpoint in board frame

        def sample(off):
            vv = jnp.arange(h, dtype=jnp.float32)[:, None] + off[1]
            uu = jnp.arange(w, dtype=jnp.float32)[None, :] + off[0]
            uvgrid = jnp.stack([jnp.broadcast_to(uu, (h, w)),
                                jnp.broadcast_to(vv, (h, w))], axis=-1)
            ray, ok = lift(view, uvgrid)           # rig-frame directions
            d_b = jnp.einsum("ij,hwj->hwi", X[:3, :3], ray)
            dz = d_b[..., 2]
            t = -o_b[2] / jnp.where(jnp.abs(dz) < 1e-6, 1e-6, dz)
            hit = ok & (t > 0.05) & (jnp.abs(dz) >= 1e-6)
            px = o_b[0] + t * d_b[..., 0]
            py = o_b[1] + t * d_b[..., 1]
            val = _checker(px, py, nx, ny, square)
            return jnp.where(hit, val, background)

        img = jnp.mean(jax.vmap(sample)(offs), axis=0)   # 2x2 supersample
        return img, annulus_mask(view, h, w)

    img_top, m_top = shade_view(rig.top)
    img_bot, m_bot = shade_view(rig.bottom)
    return jnp.where(m_top, img_top, jnp.where(m_bot, img_bot, 0.0))
