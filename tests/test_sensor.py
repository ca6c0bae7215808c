"""Sensor-model round-trip tests (SURVEY.md SS4.1: lift(project(X)) || X/|X|
across the full valid annulus, both views)."""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.sensor import model as sm
from sosvo.sensor.rig import default_rig, project_rig, stereo_overlap_band
from sosvo.geom.lie import mat_inv, transform_points


def _random_pts_in_band(key, n, view, r_min=0.5, r_max=8.0):
    k1, k2, k3 = jax.random.split(key, 3)
    az = jax.random.uniform(k1, (n,), minval=-jnp.pi, maxval=jnp.pi)
    el = jax.random.uniform(k2, (n,), minval=view.min_elevation + 0.01, maxval=view.max_elevation - 0.01)
    r = jax.random.uniform(k3, (n,), minval=r_min, maxval=r_max)
    return r[:, None] * jnp.stack([jnp.cos(el) * jnp.cos(az), jnp.cos(el) * jnp.sin(az), jnp.sin(el)], axis=-1)


def test_project_lift_roundtrip_both_views():
    rig = default_rig()
    for name, view in [("top", rig.top), ("bottom", rig.bottom)]:
        pts = _random_pts_in_band(jax.random.PRNGKey(0), 2000, view)
        uv, ok = sm.project(view, pts)
        assert bool(jnp.all(ok)), name
        ray, ok2 = sm.lift(view, uv)
        assert bool(jnp.all(ok2)), name
        dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(ray), np.asarray(dirs), atol=2e-5, err_msg=name)


def test_lift_project_roundtrip_pixels():
    # Start from pixels inside the annulus, lift, project back.
    rig = default_rig()
    for view in [rig.top, rig.bottom]:
        r_in, r_out = sm.annulus_bounds(view)
        key = jax.random.PRNGKey(1)
        theta = jax.random.uniform(key, (1000,), minval=-jnp.pi, maxval=jnp.pi)
        r = jax.random.uniform(jax.random.PRNGKey(2), (1000,), minval=float(r_in) + 1.0, maxval=float(r_out) - 1.0)
        uv = jnp.stack([view.cx + r * jnp.cos(theta), view.cy + r * jnp.sin(theta)], axis=-1)
        ray, ok = sm.lift(view, uv)
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(np.asarray(jnp.linalg.norm(ray, axis=-1)), 1.0, atol=1e-5)
        uv2, ok2 = sm.project(view, ray * 3.0)
        assert bool(jnp.all(ok2))
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=2e-2)


def test_annuli_disjoint():
    rig = default_rig()
    t_in, t_out = sm.annulus_bounds(rig.top)
    b_in, b_out = sm.annulus_bounds(rig.bottom)
    # Bottom view is the inner annulus; no overlap with top's annulus.
    assert float(b_out) < float(t_in), (float(b_out), float(t_in))
    assert float(t_out) < rig.image_width / 2.0


def test_stereo_projection_consistency():
    # A rig-frame point projects into both views; lifted rays intersect at it.
    rig = default_rig()
    lo, hi = stereo_overlap_band(rig)
    key = jax.random.PRNGKey(3)
    az = jax.random.uniform(key, (500,), minval=-jnp.pi, maxval=jnp.pi)
    el = jax.random.uniform(jax.random.PRNGKey(4), (500,), minval=float(lo) + 0.05, maxval=float(hi) - 0.05)
    r = jax.random.uniform(jax.random.PRNGKey(5), (500,), minval=1.0, maxval=5.0)
    pts = r[:, None] * jnp.stack([jnp.cos(el) * jnp.cos(az), jnp.cos(el) * jnp.sin(az), jnp.sin(el)], axis=-1)
    (uv_t, ok_t), (uv_b, ok_b) = project_rig(rig, pts)
    frac = float(jnp.mean((ok_t & ok_b).astype(jnp.float32)))
    assert frac > 0.8, frac
    # Azimuth alignment: both views see the same azimuth for the same point
    # only approximately at finite range (parallax is vertical); check the
    # azimuth difference is small for far points.
    far = pts * 50.0
    (uvt, okt), (uvb, okb) = project_rig(rig, far)
    az_t = jnp.arctan2(uvt[:, 1] - rig.top.cy, uvt[:, 0] - rig.top.cx)
    az_b = jnp.arctan2(uvb[:, 1] - rig.bottom.cy, uvb[:, 0] - rig.bottom.cx)
    d = jnp.abs(jnp.arctan2(jnp.sin(az_t - az_b), jnp.cos(az_t - az_b)))
    ok = okt & okb
    assert float(jnp.max(jnp.where(ok, d, 0.0))) < 1e-3


def test_project_differentiable():
    rig = default_rig()
    pt = jnp.array([2.0, 1.0, -0.5])

    def loss(p):
        uv, _ = sm.project(rig.top, p)
        return jnp.sum(uv**2)

    g = jax.grad(loss)(pt)
    assert np.all(np.isfinite(np.asarray(g)))
    # Finite-difference check.
    eps = 1e-3
    for i in range(3):
        e = jnp.zeros(3).at[i].set(eps)
        fd = (loss(pt + e) - loss(pt - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=2e-2, atol=1e-2)


def test_roundtrip_with_distortion_and_misalignment():
    """Full-GUM terms (SURVEY.md C3): lift(project(X)) || X with nonzero
    radial/tangential distortion and mirror-axis misalignment (fixed-point
    undistort + Rodrigues de-rotation)."""
    rig = default_rig()
    for base in [rig.top, rig.bottom]:
        # NB coefficient scale: this model's normalized plane has r2 up to ~6
        # at the annulus edge (catadioptric m = cos(el)/(sin(el)+xi) is large
        # at low elevation), so realistic coefficients are ~10x smaller than
        # pinhole-camera habits; |k1| ~ 0.1 would make the distortion
        # non-invertible at the outer band.
        view = base._replace(
            k1=jnp.float32(-0.02), k2=jnp.float32(1e-3),
            p1=jnp.float32(5e-4), p2=jnp.float32(-4e-4),
            mis_rx=jnp.float32(0.01), mis_ry=jnp.float32(-0.008),
        )
        pts = _random_pts_in_band(jax.random.PRNGKey(7), 2000, view)
        uv, ok = sm.project(view, pts)
        uvc, _ = sm.project(base, pts)
        # The terms are material: pixels move by much more than the tolerance.
        moved = float(jnp.max(jnp.linalg.norm(uv - uvc, axis=-1)))
        assert moved > 1.0, moved
        ray, _ = sm.lift(view, uv)
        dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        err = jnp.linalg.norm(ray - dirs, axis=-1)
        # Only judge points the distorted projection accepted.
        assert float(jnp.max(jnp.where(ok, err, 0.0))) < 5e-5


def test_zero_distortion_reduces_to_clean_model():
    """With all GUM terms at their zero defaults, project equals the clean
    closed-form unified model bit-for-bit (identity rotation and zero
    distortion introduce no rounding: x*1 + y*0 is exact in f32)."""
    rig = default_rig()
    view = rig.top
    pts = _random_pts_in_band(jax.random.PRNGKey(8), 500, view)
    uv, _ = sm.project(view, pts)
    s = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    m = s[:, :2] / (s[:, 2:3] + view.xi)
    uv_clean = jnp.stack([view.fx * m[:, 0] + view.cx,
                          view.fy * m[:, 1] + view.cy], axis=-1)
    np.testing.assert_array_equal(np.asarray(uv), np.asarray(uv_clean))


def test_annulus_mask_matches_projection():
    rig = default_rig()
    mask = sm.annulus_mask(rig.top, rig.image_height, rig.image_width)
    # Project a point in the middle of the band; its pixel must be masked in.
    el = (rig.top.min_elevation + rig.top.max_elevation) / 2.0
    pt = 3.0 * jnp.stack([jnp.cos(el), jnp.zeros(()), jnp.sin(el)])
    uv, ok = sm.project(rig.top, pt)
    assert bool(ok)
    u, v = int(round(float(uv[0]))), int(round(float(uv[1])))
    assert bool(mask[v, u])
