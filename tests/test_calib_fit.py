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
