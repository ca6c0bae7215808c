"""Calibration fitting (C16): recover unified-model params from control points."""

import jax
import jax.numpy as jnp

from sosvo.calib.fit import fit_view
from sosvo.sensor.model import project
from sosvo.sensor.rig import default_rig


def _control_points(view, key, n=400):
    """Random 3D points inside the view's frustum + their exact pixels."""
    k1, k2, k3 = jax.random.split(key, 3)
    az = jax.random.uniform(k1, (n,), minval=-jnp.pi, maxval=jnp.pi)
    el = jax.random.uniform(k2, (n,), minval=float(view.min_elevation) + 0.03,
                            maxval=float(view.max_elevation) - 0.03)
    r = jax.random.uniform(k3, (n,), minval=0.5, maxval=5.0)
    pts = jnp.stack([r * jnp.cos(el) * jnp.cos(az),
                     r * jnp.cos(el) * jnp.sin(az),
                     r * jnp.sin(el)], axis=-1)
    uv, ok = project(view, pts)
    return pts, uv, ok


def test_fit_recovers_perturbed_intrinsics():
    rig = default_rig()
    gt = rig.top
    pts, uv, ok = _control_points(gt, jax.random.PRNGKey(0))
    init = gt._replace(xi=gt.xi * 1.05, fx=gt.fx * 0.93, fy=gt.fy * 1.04,
                       cx=gt.cx + 6.0, cy=gt.cy - 4.0)
    res = jax.jit(lambda: fit_view(init, pts, uv, weights=ok.astype(jnp.float32),
                                   iters=25))()
    assert float(res.rms0_px) > 1.0          # the perturbation was material
    assert float(res.rms_px) < 1e-2, float(res.rms_px)
    assert abs(float(res.view.xi - gt.xi)) < 1e-3
    assert abs(float(res.view.fx - gt.fx)) < 0.2
    assert abs(float(res.view.cx - gt.cx)) < 0.05


def test_fit_recovers_distortion_and_misalignment():
    """Full-GUM recovery (VERDICT r1 item 6): inject nonzero radial/tangential
    distortion + mirror-axis misalignment, fit from a zero-terms init, and
    check the injected values come back."""
    rig = default_rig()
    # Coefficient scale: r2 reaches ~6 at this rig's annulus edge, so these
    # values move pixels by several px (see test_sensor.py scale note).
    gt = rig.top._replace(
        k1=jnp.float32(-0.02), k2=jnp.float32(1e-3),
        p1=jnp.float32(6e-4), p2=jnp.float32(-4e-4),
        mis_rx=jnp.float32(0.012), mis_ry=jnp.float32(-0.009),
    )
    pts, uv, ok = _control_points(gt, jax.random.PRNGKey(3), n=600)
    init = rig.top  # all GUM terms zero, intrinsics already right
    res = jax.jit(lambda: fit_view(init, pts, uv, weights=ok.astype(jnp.float32),
                                   iters=40, fit_distortion=True,
                                   fit_misalignment=True))()
    assert float(res.rms0_px) > 0.5, float(res.rms0_px)   # terms were material
    assert float(res.rms_px) < 2e-2, float(res.rms_px)
    assert abs(float(res.view.k1 - gt.k1)) < 5e-3
    assert abs(float(res.view.k2 - gt.k2)) < 5e-3
    assert abs(float(res.view.mis_rx - gt.mis_rx)) < 5e-4
    assert abs(float(res.view.mis_ry - gt.mis_ry)) < 5e-4


def test_fit_noisy_observations():
    rig = default_rig()
    gt = rig.bottom
    pts, uv, ok = _control_points(gt, jax.random.PRNGKey(1))
    uv = uv + 0.3 * jax.random.normal(jax.random.PRNGKey(2), uv.shape)
    init = gt._replace(fx=gt.fx * 1.08, cx=gt.cx - 5.0)
    res = fit_view(init, pts, uv, weights=ok.astype(jnp.float32), iters=25)
    # Noise floor: rms here is sqrt(E|r|^2) with 2 components of sigma=0.3,
    # i.e. ~0.42 px; require convergence to within ~15% of it.
    assert float(res.rms_px) < 0.5
    assert abs(float(res.view.fx - gt.fx)) < 0.5
