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
    """Static panorama geometry + the precomputed sampling LUT for one view.

    Besides the float (u, v) coords, the bilinear interpolation is fully
    precomputed at calibration time (SURVEY.md C5 "LUT build ... once"):
    flat corner indices + corner weights, so the per-frame warp is four flat
    `jnp.take` gathers and a weighted sum -- measured ~3x faster on TPU than
    `map_coordinates`, whose general gather lowers poorly.
    """

    height: int
    width: int
    min_elevation: float
    max_elevation: float
    lut_uv: jnp.ndarray   # (H, W, 2) raw-image (u, v) sample coords
    valid: jnp.ndarray    # (H, W) bool: LUT lands inside the view's annulus
    idx00: jnp.ndarray    # (H, W) int32 flat raw-image index of the NW corner
    idx01: jnp.ndarray    # (H, W) NE
    idx10: jnp.ndarray    # (H, W) SW
    idx11: jnp.ndarray    # (H, W) SE
    w00: jnp.ndarray      # (H, W) f32 bilinear corner weights
    w01: jnp.ndarray
    w10: jnp.ndarray
    w11: jnp.ndarray


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
                        min_el: float | None = None, max_el: float | None = None,
                        image_height: int = 768, image_width: int = 768) -> PanoGeometry:
    """Build the sampling LUT mapping panorama pixels -> raw-image coords.

    Run once per calibration (SURVEY.md C5 "LUT build in JAX once"); the
    result is a pytree of device arrays closed over by the jitted frontend.
    `image_height/width` size the precomputed flat bilinear indices.
    """
    min_el = float(view.min_elevation) if min_el is None else min_el
    max_el = float(view.max_elevation) if max_el is None else max_el
    rows = jnp.arange(height, dtype=jnp.float32)
    cols = jnp.arange(width, dtype=jnp.float32)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    rays = pano_ray(height, width, min_el, max_el, rr, cc)
    uv, ok = project(view, rays)

    # Precompute the bilinear sample: clamp to the image, flat corner indices.
    u = jnp.clip(uv[..., 0], 0.0, image_width - 1.001)
    v = jnp.clip(uv[..., 1], 0.0, image_height - 1.001)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    flat = lambda r, c: (r * image_width + c).astype(jnp.int32)
    return PanoGeometry(
        height=height,
        width=width,
        min_elevation=min_el,
        max_elevation=max_el,
        lut_uv=uv,
        valid=ok,
        idx00=flat(v0i, u0i),
        idx01=flat(v0i, u0i + 1),
        idx10=flat(v0i + 1, u0i),
        idx11=flat(v0i + 1, u0i + 1),
        w00=(1.0 - fv) * (1.0 - fu),
        w01=(1.0 - fv) * fu,
        w10=fv * (1.0 - fu),
        w11=fv * fu,
    )


def warp_panorama(image: jnp.ndarray, geom: PanoGeometry) -> jnp.ndarray:
    """Bilinear-sample the raw omni image into the panorama. (H, W) float32.

    Equivalent of the reference's `cv2.remap` call. All interpolation
    arithmetic is baked into the static LUT, so the per-frame work is four
    flat 1D gathers + a weighted sum (TPU's general 2D gather path, as used
    by `map_coordinates`, measured ~3x slower).
    """
    flat = image.reshape(-1)
    pano = (geom.w00 * jnp.take(flat, geom.idx00)
            + geom.w01 * jnp.take(flat, geom.idx01)
            + geom.w10 * jnp.take(flat, geom.idx10)
            + geom.w11 * jnp.take(flat, geom.idx11))
    return jnp.where(geom.valid, pano, 0.0)
