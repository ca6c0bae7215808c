"""Pallas Schur kernel == XLA reduce_camera_system (SURVEY.md section 4.1)."""

import jax
import jax.numpy as jnp

from sosvo.backend.ba import build_blocks
from sosvo.backend.schur import reduce_camera_system
from sosvo.kernels.schur_pallas import reduce_camera_system_pallas
from tests.test_ba import _make_window


def test_schur_pallas_matches_xla():
    win, X_gt, lms = _make_window(jax.random.PRNGKey(21), pose_noise=0.02,
                                  lm_noise=0.03, pixel_like_noise=1e-3)
    H_cc, H_cl, H_ll, b_c, b_l, _ = build_blocks(win)
    lam = 1e-3

    eye3 = jnp.eye(3, dtype=H_ll.dtype)
    eye6 = jnp.eye(6, dtype=H_cc.dtype)
    H_ll_inv = jnp.linalg.inv(H_ll + lam * eye3[None])
    S_ref, b_ref = reduce_camera_system(H_cc + lam * eye6[None], H_cl,
                                        H_ll_inv, b_c, b_l)

    S_pal, b_pal, inv_pal = reduce_camera_system_pallas(
        H_cc, H_cl, H_ll, b_c, b_l, lam, interpret=True)

    scale = float(jnp.max(jnp.abs(S_ref))) + 1e-9
    assert float(jnp.max(jnp.abs(S_pal - S_ref))) / scale < 1e-5
    bscale = float(jnp.max(jnp.abs(b_ref))) + 1e-9
    assert float(jnp.max(jnp.abs(b_pal - b_ref))) / bscale < 1e-5
    inv_scale = float(jnp.max(jnp.abs(H_ll_inv))) + 1e-9
    assert float(jnp.max(jnp.abs(inv_pal - H_ll_inv))) / inv_scale < 1e-4


def test_schur_pallas_sharded_matches_single(devices8):
    """Landmark-sharded kernel partials psum to the single-device reduction.

    This is the production c5 path (ba.py lm_step: use_pallas + axis_name):
    each shard runs the fused kernel on its landmark shard and the wrapper
    psums (S_off, b_sub) over the model axis.
    """
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from sosvo.dist.mesh import MODEL_AXIS, model_mesh

    win, _, _ = _make_window(jax.random.PRNGKey(23), pose_noise=0.02,
                             lm_noise=0.03, pixel_like_noise=2e-3)
    H_cc, H_cl, H_ll, b_c, b_l, _ = build_blocks(win)
    lam = 1e-3
    S_ref, b_ref, inv_ref = reduce_camera_system_pallas(
        H_cc, H_cl, H_ll, b_c, b_l, lam, interpret=True)

    mesh = model_mesh(8)
    fn = shard_map(
        functools.partial(reduce_camera_system_pallas, lam=lam, interpret=True,
                          axis_name=MODEL_AXIS),
        mesh=mesh,
        in_specs=(P(), P(None, MODEL_AXIS), P(MODEL_AXIS), P(), P(MODEL_AXIS)),
        out_specs=(P(), P(), P(MODEL_AXIS)),
        check_vma=False,
    )
    S_sh, b_sh, inv_sh = fn(H_cc, H_cl, H_ll, b_c, b_l)
    scale = float(jnp.max(jnp.abs(S_ref))) + 1e-9
    assert float(jnp.max(jnp.abs(S_sh - S_ref))) / scale < 1e-5
    bscale = float(jnp.max(jnp.abs(b_ref))) + 1e-9
    assert float(jnp.max(jnp.abs(b_sh - b_ref))) / bscale < 1e-5
    assert float(jnp.max(jnp.abs(inv_sh - inv_ref))) < 1e-4 * (
        float(jnp.max(jnp.abs(inv_ref))) + 1.0)


def test_sharded_ba_with_pallas_schur(devices8):
    """Full distributed ba_solve on the Pallas path == single-device solve."""
    from sosvo.backend.ba import ba_solve
    from sosvo.dist.ba_dist import ba_solve_sharded
    from sosvo.dist.mesh import model_mesh

    win, X_gt, _ = _make_window(jax.random.PRNGKey(24), pose_noise=0.02,
                                lm_noise=0.03, pixel_like_noise=2e-3)
    mesh = model_mesh(8)
    res_s = ba_solve_sharded(mesh, win, iters=3, use_pallas=True,
                             pallas_interpret=True)
    res_1 = ba_solve(win, iters=3)
    assert float(jnp.max(jnp.abs(res_s.X - res_1.X))) < 1e-4
    assert abs(float(res_s.cost) - float(res_1.cost)) < 1e-6 + 1e-3 * float(res_1.cost)


def test_schur_pallas_padding_is_exact():
    """Non-multiple-of-tile landmark counts pad with inert blocks."""
    win, _, _ = _make_window(jax.random.PRNGKey(22), pose_noise=0.01, lm_noise=0.01)
    H_cc, H_cl, H_ll, b_c, b_l, _ = build_blocks(win)
    lam = 1e-2
    # L=128 from the window; slice to an odd count to force padding.
    Lodd = 100
    H_cl_o, H_ll_o, b_l_o = H_cl[:, :Lodd], H_ll[:Lodd], b_l[:Lodd]

    eye3 = jnp.eye(3, dtype=H_ll.dtype)
    eye6 = jnp.eye(6, dtype=H_cc.dtype)
    H_ll_inv = jnp.linalg.inv(H_ll_o + lam * eye3[None])
    S_ref, b_ref = reduce_camera_system(H_cc + lam * eye6[None], H_cl_o,
                                        H_ll_inv, b_c, b_l_o)
    S_pal, b_pal, _ = reduce_camera_system_pallas(
        H_cc, H_cl_o, H_ll_o, b_c, b_l_o, lam, interpret=True)
    scale = float(jnp.max(jnp.abs(S_ref))) + 1e-9
    assert float(jnp.max(jnp.abs(S_pal - S_ref))) / scale < 1e-5
    assert float(jnp.max(jnp.abs(b_pal - b_ref))) < 1e-4 * (float(jnp.max(jnp.abs(b_ref))) + 1.0)
