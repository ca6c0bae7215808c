"""Pure-JAX omnidirectional camera model (unified catadioptric / GUM).

TPU-native replacement for the reference's sensor-model layer (SURVEY.md C2/C3:
`omnistereo/camera_models.py`, the largest module of the reference). The
reference mount is empty (SURVEY.md SS0), so the model implemented here is the
published one underlying that code: the unified (sphere) model for a central
catadioptric camera -- a hyperbolic mirror whose focus coincides with the
pinhole's effective viewpoint, parameterised by the mirror parameter `xi`
(Geyer-Daniilidis / Mei; the papers' GUM reduces to this for a calibrated
hyperbolic mirror). BASELINE.json:5 mandates "mirror + pinhole lifting to unit
sphere rays ... pure JAX functions so the whole frontend+backend JITs
end-to-end" -- this module is that contract.

Projection (view frame, viewpoint at origin, z up the mirror axis):
    s   = X / |X|                       (lift to unit sphere)
    m   = (s_x, s_y) / (s_z + xi)       (perspective from sphere-center + xi)
    u   = fx * m_x + cx ;  v = fy * m_y + cy

Unprojection (closed form, exact inverse):
    m   = ((u-cx)/fx, (v-cy)/fy),  r2 = |m|^2
    eta = (xi + sqrt(1 + (1 - xi^2) r2)) / (r2 + 1)
    ray = (eta * m_x, eta * m_y, eta - xi)          (unit norm by construction)

All functions are differentiable (BA Jacobians flow through `project`),
shape-polymorphic over leading batch dims, and f32-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ViewParams(NamedTuple):
    """Calibrated parameters of one catadioptric view (top or bottom mirror).

    A pytree of scalars/small arrays -- safe to close over or pass through jit.

    Attributes:
      xi: mirror parameter of the unified model (0 = pinhole, ->1 parabola).
      fx, fy, cx, cy: pinhole intrinsics of the (mirror-composed) projection.
      min_elevation, max_elevation: valid elevation band (radians) of this
        view; defines the annular valid region in the raw image.
      z_offset: viewpoint height on the common vertical axis, in the rig
        frame (top view usually 0, bottom view -baseline).
    """

    xi: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    min_elevation: jnp.ndarray
    max_elevation: jnp.ndarray
    z_offset: jnp.ndarray

    @staticmethod
    def create(xi, fx, fy, cx, cy, min_elevation, max_elevation, z_offset=0.0):
        f = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return ViewParams(f(xi), f(fx), f(fy), f(cx), f(cy), f(min_elevation), f(max_elevation), f(z_offset))


def viewpoint(view: ViewParams) -> jnp.ndarray:
    """The view's effective viewpoint (single effective focus) in rig frame."""
    z = jnp.asarray(view.z_offset)
    zero = jnp.zeros_like(z)
    return jnp.stack([zero, zero, z], axis=-1)


def project(view: ViewParams, pts_view: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project 3D points (view frame, viewpoint at origin) to pixels.

    Args:
      view: calibrated view parameters.
      pts_view: (..., 3) points in the view frame.

    Returns:
      uv: (..., 2) pixel coordinates (u = column-ish x, v = row-ish y).
      valid: (...,) bool -- point inside the view's elevation band and in
        front of the model's projection singularity (s_z + xi > eps).
    """
    norm = jnp.linalg.norm(pts_view, axis=-1, keepdims=True)
    s = pts_view / jnp.maximum(norm, 1e-9)
    denom = s[..., 2] + view.xi
    safe = denom > 1e-6
    denom_safe = jnp.where(safe, denom, 1.0)
    mx = s[..., 0] / denom_safe
    my = s[..., 1] / denom_safe
    u = view.fx * mx + view.cx
    v = view.fy * my + view.cy
    elevation = jnp.arcsin(jnp.clip(s[..., 2], -1.0, 1.0))
    valid = (
        safe
        & (elevation >= view.min_elevation)
        & (elevation <= view.max_elevation)
        & (norm[..., 0] > 1e-6)
    )
    return jnp.stack([u, v], axis=-1), valid


def lift(view: ViewParams, uv: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lift pixels to unit-sphere rays in the view frame (closed-form inverse).

    Args:
      view: calibrated view parameters.
      uv: (..., 2) pixel coordinates.

    Returns:
      ray: (..., 3) unit direction leaving the viewpoint.
      valid: (...,) bool -- ray's elevation inside the view band.
    """
    mx = (uv[..., 0] - view.cx) / view.fx
    my = (uv[..., 1] - view.cy) / view.fy
    r2 = mx * mx + my * my
    disc = 1.0 + (1.0 - view.xi * view.xi) * r2
    eta = (view.xi + jnp.sqrt(jnp.maximum(disc, 0.0))) / (r2 + 1.0)
    ray = jnp.stack([eta * mx, eta * my, eta - view.xi], axis=-1)
    ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-9)
    elevation = jnp.arcsin(jnp.clip(ray[..., 2], -1.0, 1.0))
    valid = (elevation >= view.min_elevation) & (elevation <= view.max_elevation) & (disc > 0.0)
    return ray, valid


def radius_of_elevation(view: ViewParams, elevation: jnp.ndarray) -> jnp.ndarray:
    """Image radius (pixels, isotropic f = fx) of a ray at given elevation.

    Used to derive the annular valid-region bounds of the view in the raw
    image (SURVEY.md C3 "valid-region masks (annuli)").
    """
    sz = jnp.sin(elevation)
    c = jnp.cos(elevation)
    return view.fx * c / (sz + view.xi)


def annulus_bounds(view: ViewParams) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(r_inner, r_outer) pixel radii of this view's valid annulus.

    Radius decreases with elevation (higher elevation -> closer to center),
    so r_inner corresponds to max_elevation and r_outer to min_elevation.
    """
    r_hi = radius_of_elevation(view, view.max_elevation)
    r_lo = radius_of_elevation(view, view.min_elevation)
    return jnp.minimum(r_hi, r_lo), jnp.maximum(r_hi, r_lo)


def annulus_mask(view: ViewParams, height: int, width: int) -> jnp.ndarray:
    """Boolean (H, W) mask of the view's valid annulus in the raw image."""
    r_in, r_out = annulus_bounds(view)
    vv = jnp.arange(height, dtype=jnp.float32)[:, None]
    uu = jnp.arange(width, dtype=jnp.float32)[None, :]
    r = jnp.sqrt((uu - view.cx) ** 2 + (vv - view.cy) ** 2)
    return (r >= r_in) & (r <= r_out)
