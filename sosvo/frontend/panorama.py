"""Cylindrical panorama generation from the raw omnidirectional image.

TPU-native replacement for the reference's LUT + `cv2.remap` panorama stage
(SURVEY.md C5: per-view pixel LUT built once per calibration, then a C++
remap per frame). Here the LUT is built in JAX once per (rig, pano-geometry)
and the per-frame warp is a bilinear gather via
`jax.scipy.ndimage.map_coordinates` -- pure XLA, fuses into the jitted step.

Panorama geometry [P1]: rows sample elevation linearly in [min_el, max_el]
(top row = max elevation), columns sample azimuth uniformly over [-pi, pi).
Because the two views are coaxial, the SAME column in the top and bottom
panoramas corresponds to the SAME azimuth: epipolar curves become columns,
and stereo matching reduces to a per-column search. The panorama wraps
horizontally (azimuth is circular).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sosvo.sensor.model import ViewParams, project


class PanoGeometry(NamedTuple):
    """Static panorama geometry + the precomputed sampling LUT for one view."""

    height: int
    width: int
    min_elevation: float
    max_elevation: float
    lut_uv: jnp.ndarray   # (H, W, 2) raw-image (u, v) sample coords
    valid: jnp.ndarray    # (H, W) bool: LUT lands inside the view's annulus


def pano_ray(height: int, width: int, min_el: float, max_el: float,
             row: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """Unit ray (view frame) of a panorama pixel; row/col may be fractional."""
    az = (col + 0.5) / width * (2.0 * jnp.pi) - jnp.pi
    el = max_el - (row + 0.5) / height * (max_el - min_el)
    cos_el = jnp.cos(el)
    return jnp.stack([cos_el * jnp.cos(az), cos_el * jnp.sin(az), jnp.sin(el)], axis=-1)


def pano_azimuth(width: int, col: jnp.ndarray) -> jnp.ndarray:
    return (col + 0.5) / width * (2.0 * jnp.pi) - jnp.pi


def pano_elevation(height: int, min_el: float, max_el: float, row: jnp.ndarray) -> jnp.ndarray:
    return max_el - (row + 0.5) / height * (max_el - min_el)


def build_pano_geometry(view: ViewParams, height: int, width: int,
                        min_el: float | None = None, max_el: float | None = None) -> PanoGeometry:
    """Build the sampling LUT mapping panorama pixels -> raw-image coords.

    Run once per calibration (SURVEY.md C5 "LUT build in JAX once"); the
    result is a pytree of device arrays closed over by the jitted frontend.
    """
    min_el = float(view.min_elevation) if min_el is None else min_el
    max_el = float(view.max_elevation) if max_el is None else max_el
    rows = jnp.arange(height, dtype=jnp.float32)
    cols = jnp.arange(width, dtype=jnp.float32)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    rays = pano_ray(height, width, min_el, max_el, rr, cc)
    uv, ok = project(view, rays)
    return PanoGeometry(
        height=height,
        width=width,
        min_elevation=min_el,
        max_elevation=max_el,
        lut_uv=uv,
        valid=ok,
    )


def warp_panorama(image: jnp.ndarray, geom: PanoGeometry) -> jnp.ndarray:
    """Bilinear-sample the raw omni image into the panorama. (H, W) float32.

    Equivalent of the reference's `cv2.remap` call, as an XLA gather.
    """
    # map_coordinates expects (row, col) = (v, u).
    coords = [geom.lut_uv[..., 1], geom.lut_uv[..., 0]]
    pano = jax.scipy.ndimage.map_coordinates(image, coords, order=1, mode="constant", cval=0.0)
    return jnp.where(geom.valid, pano, 0.0)
