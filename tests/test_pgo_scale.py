"""Scalable pose-graph solvers: matrix-free CG (SURVEY.md C14 sparse solve)
and time-axis node sharding with ring-ppermute halo exchange (P4-SP).

Invariants: the CG solver matches the dense 6Nx6N solver on loopy graphs,
and the time-sharded solver on an 8-device CPU mesh matches the dense
single-device solver on the SAME graph (SURVEY.md section 4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sosvo.backend.pose_graph import (
    PoseGraph, odometry_edges, pgo_solve,
)
from sosvo.dist.pgo_time import TimeShardedGraph, pgo_solve_time_sharded
from sosvo.geom.lie import mat_inv, se3_exp


def _make_loopy_graph(n=24, e_loop=6, noise=0.05, seed=0):
    """Ground-truth circle trajectory, noisy node inits, exact odometry +
    loop measurements. Returns (graph arrays, ground-truth X)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    X_gt = []
    for a in t:
        tw = jnp.asarray([0.0, 0.0, a, np.cos(a), np.sin(a), 0.1 * np.sin(2 * a)],
                         jnp.float32)
        X_gt.append(se3_exp(tw))
    X_gt = jnp.stack(X_gt)

    # Noisy initialization (anchor node exact).
    pert = jnp.asarray(rng.normal(0, noise, (n, 6)), jnp.float32)
    pert = pert.at[0].set(0.0)
    X0 = jnp.einsum("nij,njk->nik", jax.vmap(se3_exp)(pert), X_gt)

    # Exact odometry measurements from ground truth.
    ei = jnp.arange(1, n, dtype=jnp.int32)
    ej = jnp.arange(0, n - 1, dtype=jnp.int32)
    T_odo = jnp.einsum("nij,njk->nik", X_gt[ei], jax.vmap(mat_inv)(X_gt[ej]))

    # Loop closures between distant nodes.
    li = jnp.asarray(rng.integers(n // 2, n, e_loop), jnp.int32)
    lj = jnp.asarray(rng.integers(0, n // 2, e_loop), jnp.int32)
    T_loop = jnp.einsum("nij,njk->nik", X_gt[li], jax.vmap(mat_inv)(X_gt[lj]))
    return X_gt, X0, (ei, ej, T_odo), (li, lj, T_loop)


def _flat_graph(n, X0, odo, loop):
    ei, ej, T_odo = odo
    li, lj, T_loop = loop
    return PoseGraph(
        X=X0,
        node_valid=jnp.ones(n, bool),
        ei=jnp.concatenate([ei, li]),
        ej=jnp.concatenate([ej, lj]),
        T_meas=jnp.concatenate([T_odo, T_loop]),
        w=jnp.ones(ei.shape[0] + li.shape[0], jnp.float32),
    )


def test_cg_solver_matches_dense():
    n = 24
    X_gt, X0, odo, loop = _make_loopy_graph(n)
    g = _flat_graph(n, X0, odo, loop)
    dense = jax.jit(lambda g: pgo_solve(g, iters=8))(g)
    cg = jax.jit(lambda g: pgo_solve(g, iters=8, solver="cg", cg_iters=60))(g)
    assert float(cg.cost) < 0.1 * float(cg.cost0)
    # Both solvers relax to (nearly) the same optimum.
    np.testing.assert_allclose(np.asarray(cg.X), np.asarray(dense.X),
                               atol=2e-3)
    # And both land near ground truth (exact measurements).
    err = np.abs(np.asarray(cg.X) - np.asarray(X_gt)).max()
    assert err < 2e-2, err


def test_cg_rejects_unknown_solver():
    n = 8
    _, X0, odo, loop = _make_loopy_graph(n, e_loop=2)
    g = _flat_graph(n, X0, odo, loop)
    with pytest.raises(ValueError):
        pgo_solve(g, solver="qr")


def test_time_sharded_matches_dense():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest sets XLA_FLAGS)")
    from sosvo.dist.mesh import MODEL_AXIS, model_mesh

    n, d = 32, 8
    X_gt, X0, odo, loop = _make_loopy_graph(n, e_loop=8, seed=3)
    ei, ej, T_odo = odo
    li, lj, T_loop = loop

    # Dense reference on the flat graph.
    g_flat = _flat_graph(n, X0, odo, loop)
    dense = jax.jit(lambda g: pgo_solve(g, iters=6))(g_flat)

    # Time-sharded layout: odometry slot l constrains (l+1, l); last slot off.
    w_odo = jnp.ones(n, jnp.float32).at[n - 1].set(0.0)
    T_odo_slots = jnp.concatenate([T_odo, jnp.eye(4, dtype=jnp.float32)[None]])
    g_time = TimeShardedGraph(
        X=X0, node_valid=jnp.ones(n, bool),
        T_odo=T_odo_slots, w_odo=w_odo,
        loop_i=li, loop_j=lj, T_loop=T_loop,
        w_loop=jnp.ones(li.shape[0], jnp.float32),
    )
    mesh = model_mesh(d)
    res = pgo_solve_time_sharded(mesh, MODEL_AXIS, g_time, iters=6, cg_iters=60)

    assert float(res.cost) < 0.1 * float(res.cost0)
    np.testing.assert_allclose(np.asarray(res.cost0), np.asarray(dense.cost0),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.X), np.asarray(dense.X),
                               atol=3e-3)
    err = np.abs(np.asarray(res.X) - np.asarray(X_gt)).max()
    assert err < 2e-2, err


def test_time_sharded_robust_matches_dense():
    """Robust (DCS) time-sharded solve == robust dense solve on a graph with
    one gross outlier loop edge; both must reject it."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest sets XLA_FLAGS)")
    from sosvo.dist.mesh import MODEL_AXIS, model_mesh

    n, d = 32, 8
    X_gt, X0, odo, loop = _make_loopy_graph(n, e_loop=8, seed=5, noise=0.02)
    ei, ej, T_odo = odo
    li, lj, T_loop = loop
    # Corrupt the last loop edge with a gross bogus measurement.
    bogus = se3_exp(jnp.asarray([0.3, -0.25, 0.2, 0.5, -0.4, 0.3]))
    T_loop = T_loop.at[-1].set(bogus @ T_loop[-1])
    loop = (li, lj, T_loop)

    g_flat = _flat_graph(n, X0, odo, loop)
    dense = jax.jit(lambda g: pgo_solve(
        g, iters=8, robust="dcs", robust_delta=0.05))(g_flat)

    w_odo = jnp.ones(n, jnp.float32).at[n - 1].set(0.0)
    T_odo_slots = jnp.concatenate([T_odo, jnp.eye(4, dtype=jnp.float32)[None]])
    g_time = TimeShardedGraph(
        X=X0, node_valid=jnp.ones(n, bool),
        T_odo=T_odo_slots, w_odo=w_odo,
        loop_i=li, loop_j=lj, T_loop=T_loop,
        w_loop=jnp.ones(li.shape[0], jnp.float32),
    )
    mesh = model_mesh(d)
    res = pgo_solve_time_sharded(mesh, MODEL_AXIS, g_time, iters=8, cg_iters=60,
                                 robust="dcs", robust_delta=0.05)

    np.testing.assert_allclose(np.asarray(res.cost0), np.asarray(dense.cost0),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.X), np.asarray(dense.X),
                               atol=3e-3)
    # The outlier edge must not corrupt the solution (DCS rejects it).
    err = np.abs(np.asarray(res.X) - np.asarray(X_gt)).max()
    assert err < 2e-2, err
