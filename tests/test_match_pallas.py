"""Pallas match kernel == XLA matcher (SURVEY.md section 4.1 kernel equivalence).

Runs in Pallas interpreter mode on the CPU mesh; the compiled TPU path is
exercised by the benchmark harness (same code, interpret=False).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.frontend.match import column_band_penalty, match
from sosvo.kernels.match_pallas import match_pallas


def _random_problem(key, ka, kb, planted=40):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    da = jax.random.bits(k1, (ka, 8), dtype=jnp.uint32)
    db = jax.random.bits(k2, (kb, 8), dtype=jnp.uint32)
    db = db.at[:planted].set(da[:planted])
    va = jax.random.bernoulli(k3, 0.9, (ka,))
    vb = jax.random.bernoulli(k4, 0.9, (kb,))
    aza = jax.random.uniform(k5, (ka,), minval=-np.pi, maxval=np.pi)
    azb = jax.random.uniform(k6, (kb,), minval=-np.pi, maxval=np.pi)
    azb = azb.at[:planted].set(aza[:planted] + 0.01)
    return da, db, va, vb, aza, azb


def _check(band, key, ka=200, kb=170):
    da, db, va, vb, aza, azb = _random_problem(key, ka, kb)
    pen = None if band <= 0 else column_band_penalty(aza, azb, band, wrap=2 * np.pi)
    ref = match(da, db, va, vb, max_distance=80.0, ratio=0.9, penalty=pen)
    got = match_pallas(da, db, va, vb, max_distance=80.0, ratio=0.9,
                       az_a=aza, az_b=azb, band=band, interpret=True)
    assert bool(jnp.all(ref.valid == got.valid))
    m = ref.valid
    assert bool(jnp.all(jnp.where(m, ref.idx_b == got.idx_b, True)))
    assert bool(jnp.all(jnp.where(m, ref.dist == got.dist, True)))
    assert int(m.sum()) > 10  # the comparison is not vacuous


def test_match_pallas_equiv_unconstrained():
    _check(0.0, jax.random.PRNGKey(0))


def test_match_pallas_equiv_azimuth_band():
    _check(0.06, jax.random.PRNGKey(1))


def test_match_pallas_equiv_tile_multiple():
    _check(0.06, jax.random.PRNGKey(2), ka=256, kb=128)
