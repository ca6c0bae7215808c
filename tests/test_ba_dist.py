"""Distributed BA on the virtual 8-device CPU mesh (SURVEY.md section 4.3).

Invariant: landmark-sharded Schur BA over collectives produces the same
result as single-device BA, to f32 reduction-reordering tolerance.
"""

import jax
import jax.numpy as jnp

from sosvo.backend.ba import ba_solve
from sosvo.dist.ba_dist import ba_solve_sharded
from sosvo.dist.mesh import make_mesh, model_mesh
from tests.test_ba import _make_window


def test_sharded_ba_matches_single_device(devices8):
    # NOISY observations: with noise the global optimum differs from any
    # shard-local optimum, so this catches a solver that forgets to psum its
    # camera system over the landmark shards (shard-local solving happens to
    # match on noiseless data, where every shard converges to ground truth).
    win, X_gt, lms = _make_window(jax.random.PRNGKey(11), pose_noise=0.02,
                                  lm_noise=0.03, pixel_like_noise=2e-3)
    mesh = model_mesh(8)
    res_s = ba_solve_sharded(mesh, win, iters=6)
    res_1 = ba_solve(win, iters=6)
    assert float(jnp.max(jnp.abs(res_s.X - res_1.X))) < 1e-4
    lm_diff = jnp.linalg.norm(res_s.landmarks - res_1.landmarks, axis=-1)
    assert float(jnp.max(lm_diff)) < 1e-3
    assert abs(float(res_s.cost) - float(res_1.cost)) < 1e-6 + 1e-3 * float(res_1.cost)
    # And both recover ground truth to noise level.
    t_err = jnp.linalg.norm(res_s.X[:, :3, 3] - X_gt[:, :3, 3], axis=-1)
    assert float(jnp.max(t_err)) < 0.02


def test_sharded_ba_on_2d_mesh(devices8):
    """Model axis of a 2x4 (data, model) mesh: the c4+c5 combined layout."""
    win, X_gt, lms = _make_window(jax.random.PRNGKey(12), pose_noise=0.01, lm_noise=0.02)
    mesh = make_mesh(data=2, model=4)
    res = ba_solve_sharded(mesh, win, iters=6)
    assert float(res.cost) < 1e-6
    t_err = jnp.linalg.norm(res.X[:, :3, 3] - X_gt[:, :3, 3], axis=-1)
    assert float(jnp.max(t_err)) < 1e-3
