"""Pose-graph optimization: loop-closure relaxation on synthetic graphs.

SURVEY.md C14 / config c3. Golden setup: a drifting odometry chain whose
loop-closure edges carry the exact relative poses; PGO must pull the chain
back onto the ground truth. Also checks the edge-sharded (time-axis, P4-SP)
solver equals the single-device one on the 8-device CPU mesh.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from sosvo.backend.pose_graph import (
    PGOResult,
    PoseGraph,
    pgo_cost,
    pgo_solve,
)
from sosvo.dist.mesh import MODEL_AXIS, model_mesh
from sosvo.geom.lie import mat_inv, se3_exp
from sosvo.synth.scene import make_trajectory

N = 16


def _make_loop_problem(key, drift=0.03):
    """Ground-truth loop trajectory; odometry edges measured EXACTLY but the
    initial node estimates drift; loop edges close the chain."""
    poses = make_trajectory(N, radius=1.0, yaw_per_frame=0.12)  # ~2 rad total
    X_gt = jax.vmap(mat_inv)(poses)

    # Exact odometry + loop measurements from ground truth.
    ei = jnp.concatenate([jnp.arange(1, N), jnp.array([N - 1, N - 2])]).astype(jnp.int32)
    ej = jnp.concatenate([jnp.arange(0, N - 1), jnp.array([0, 0])]).astype(jnp.int32)
    T_meas = jnp.einsum("eij,ejk->eik", X_gt[ei], jax.vmap(mat_inv)(X_gt[ej]))
    w = jnp.ones((ei.shape[0],), jnp.float32)

    # Drifted initialization: accumulate noise along the chain.
    noise = drift * jax.random.normal(key, (N, 6))
    noise = jnp.cumsum(noise.at[0].set(0.0), axis=0)
    X0 = jnp.einsum("nij,njk->nik", se3_exp(noise), X_gt)

    g = PoseGraph(X=X0, node_valid=jnp.ones((N,), bool), ei=ei, ej=ej,
                  T_meas=T_meas, w=w)
    return g, X_gt


def test_pgo_zero_cost_at_ground_truth():
    g, X_gt = _make_loop_problem(jax.random.PRNGKey(0), drift=0.0)
    assert float(pgo_cost(g)) < 1e-9


def test_pgo_recovers_drifted_chain():
    g, X_gt = _make_loop_problem(jax.random.PRNGKey(1), drift=0.03)
    res = jax.jit(lambda gg: pgo_solve(gg, iters=10))(g)
    assert float(res.cost) < 1e-8, float(res.cost)
    t_err = jnp.linalg.norm(res.X[:, :3, 3] - X_gt[:, :3, 3], axis=-1)
    assert float(jnp.max(t_err)) < 1e-3, np.asarray(t_err)


def test_pgo_invalid_nodes_pinned():
    g, X_gt = _make_loop_problem(jax.random.PRNGKey(2), drift=0.02)
    nv = g.node_valid.at[N - 1].set(False)
    w = jnp.where((g.ei == N - 1) | (g.ej == N - 1), 0.0, g.w)
    g = g._replace(node_valid=nv, w=w)
    res = pgo_solve(g, iters=8)
    # The disabled node must not move.
    assert float(jnp.max(jnp.abs(res.X[N - 1] - g.X[N - 1]))) < 1e-6
    t_err = jnp.linalg.norm(res.X[:-1, :3, 3] - X_gt[:-1, :3, 3], axis=-1)
    assert float(jnp.max(t_err)) < 1e-3


def test_pgo_edge_sharded_matches_single(devices8):
    """P4-SP: edges sharded over the mesh, nodes replicated, partial (H, b)
    psummed -- must equal the single-device solve."""
    g, X_gt = _make_loop_problem(jax.random.PRNGKey(3), drift=0.03)
    # Pad edges to a multiple of 8 with zero-weight self-loops on node 0.
    E = g.ei.shape[0]
    Ep = ((E + 7) // 8) * 8
    pad = Ep - E
    g_pad = g._replace(
        ei=jnp.concatenate([g.ei, jnp.zeros((pad,), jnp.int32)]),
        ej=jnp.concatenate([g.ej, jnp.zeros((pad,), jnp.int32)]),
        T_meas=jnp.concatenate([g.T_meas, jnp.tile(jnp.eye(4, dtype=jnp.float32), (pad, 1, 1))]),
        w=jnp.concatenate([g.w, jnp.zeros((pad,))]),
    )

    mesh = model_mesh(8)
    specs = PoseGraph(X=P(), node_valid=P(), ei=P(MODEL_AXIS), ej=P(MODEL_AXIS),
                      T_meas=P(MODEL_AXIS), w=P(MODEL_AXIS))
    out_specs = PGOResult(X=P(), cost=P(), cost0=P(), accepted=P())
    fn = shard_map(
        functools.partial(pgo_solve, iters=10, axis_name=MODEL_AXIS),
        mesh=mesh, in_specs=(specs,), out_specs=out_specs, check_vma=False,
    )
    g_sh = jax.tree.map(lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
                        g_pad, specs)
    res_s = jax.jit(fn)(g_sh)
    res_1 = pgo_solve(g_pad, iters=10)
    assert float(res_s.cost) < 1e-8
    assert float(jnp.max(jnp.abs(res_s.X - res_1.X))) < 1e-4


def _ate(X, X_gt):
    return float(jnp.max(jnp.linalg.norm(X[:, :3, 3] - X_gt[:, :3, 3], axis=-1)))


def test_pgo_robust_rejects_wrong_loop_edge():
    """A perceptually-aliased (confidently wrong) loop edge corrupts the L2
    solve; Huber and DCS IRLS kernels bound its influence and recover the
    chain (VERDICT r1 / BASELINE c3 sweep: bad edges RAISE ATE)."""
    g, X_gt = _make_loop_problem(jax.random.PRNGKey(4), drift=0.02)
    # Append one gross outlier loop edge: claims node N-3 coincides with
    # node 1 under a large bogus transform.
    bogus = se3_exp(jnp.asarray([0.3, -0.2, 0.25, 0.4, -0.3, 0.2]))
    g_bad = g._replace(
        ei=jnp.concatenate([g.ei, jnp.asarray([N - 3], jnp.int32)]),
        ej=jnp.concatenate([g.ej, jnp.asarray([1], jnp.int32)]),
        T_meas=jnp.concatenate([g.T_meas, bogus[None]]),
        w=jnp.concatenate([g.w, jnp.asarray([2.0], jnp.float32)]),
    )
    res_l2 = jax.jit(lambda gg: pgo_solve(gg, iters=12))(g_bad)
    err_l2 = _ate(res_l2.X, X_gt)
    assert err_l2 > 0.5, err_l2  # the outlier genuinely corrupts L2 (~1.3 m)

    # DCS (redescending) drives the gross edge's influence to ~0: near-exact
    # recovery. Huber is deliberately NOT asserted here -- measured on this
    # graph its non-redescending constant-slope tail (influence delta*w per
    # unit residual, never -> 0) still drags the floppy 16-node chain ~1 m at
    # EVERY delta in [0.05, 0.5]; that is the textbook reason DCS is the
    # default (`PipelineConfig.pgo_robust`).
    res_dcs = jax.jit(lambda gg: pgo_solve(
        gg, iters=12, robust="dcs", robust_delta=0.05))(g_bad)
    assert _ate(res_dcs.X, X_gt) < 5e-3, _ate(res_dcs.X, X_gt)
    assert float(res_dcs.cost) < float(res_dcs.cost0)


def test_pgo_robust_noop_on_clean_graph():
    """With no outliers the robust solve must match the L2 solve (all edge
    residuals inside the kernel's quadratic region at convergence)."""
    g, X_gt = _make_loop_problem(jax.random.PRNGKey(5), drift=0.02)
    res_l2 = pgo_solve(g, iters=10)
    for kernel in ("huber", "dcs"):
        res_r = pgo_solve(g, iters=10, robust=kernel, robust_delta=0.05)
        assert float(jnp.max(jnp.abs(res_r.X - res_l2.X))) < 1e-3, kernel
        assert float(res_r.cost) < 1e-8


def test_pgo_robust_cg_matches_dense():
    g, _ = _make_loop_problem(jax.random.PRNGKey(6), drift=0.02)
    bogus = se3_exp(jnp.asarray([0.2, 0.1, -0.15, 0.2, 0.25, -0.1]))
    g = g._replace(
        ei=jnp.concatenate([g.ei, jnp.asarray([N - 2], jnp.int32)]),
        ej=jnp.concatenate([g.ej, jnp.asarray([2], jnp.int32)]),
        T_meas=jnp.concatenate([g.T_meas, bogus[None]]),
        w=jnp.concatenate([g.w, jnp.asarray([1.0], jnp.float32)]),
    )
    dense = pgo_solve(g, iters=10, robust="dcs", robust_delta=0.05)
    cg = pgo_solve(g, iters=10, robust="dcs", robust_delta=0.05,
                   solver="cg", cg_iters=60)
    assert float(jnp.max(jnp.abs(dense.X - cg.X))) < 1e-3
