"""Pose-graph optimization over SE(3) edge constraints (SURVEY.md C14).

Global trajectory relaxation for loop closures (benchmark config c3,
BASELINE.json:9) -- absent from the reference's online path, mandated by the
north star. Idiomatic JAX shape discipline: a FIXED-size graph (N node slots,
E edge slots, validity masks), per-edge residuals/Jacobians batched with
vmap + autodiff over both endpoint tangents, normal equations assembled by
batched scatter-add into dense (N, N, 6, 6) blocks, damped Gauss-Newton with
accept/reject inside lax.scan.

Distribution (SURVEY.md P4-SP, "time-axis sharding"): the edge set is the
work axis. Under shard_map each device holds an edge shard (node states
replicated -- they are small), computes its partial (H, b), and the partials
are psummed; the dense solve then runs replicated. The contraction over edges
commutes with psum exactly as BA's landmark contraction does.

Residual convention: nodes store X = rig-from-world; an edge (i, j) measures
T_meas ~= X_i @ X_j^-1, and the residual is the right-invariant log error
    r = se3_log(T_meas^-1 @ X_i @ X_j^-1)        in R^6.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sosvo.backend.schur import inv6x6_spd
from sosvo.geom.lie import mat_inv, se3_exp, se3_log

GAUGE_PRIOR = 1e8


class PoseGraph(NamedTuple):
    """Fixed-size pose graph (pytree)."""

    X: jnp.ndarray        # (N, 4, 4) rig-from-world node poses
    node_valid: jnp.ndarray  # (N,) bool
    ei: jnp.ndarray       # (E,) int32 edge endpoint i
    ej: jnp.ndarray       # (E,) int32 edge endpoint j
    T_meas: jnp.ndarray   # (E, 4, 4) measured X_i @ X_j^-1
    w: jnp.ndarray        # (E,) edge weights; 0 = unused slot


class PGOResult(NamedTuple):
    X: jnp.ndarray
    cost: jnp.ndarray
    cost0: jnp.ndarray
    accepted: jnp.ndarray


def edge_residual(X_i: jnp.ndarray, X_j: jnp.ndarray, T_meas: jnp.ndarray) -> jnp.ndarray:
    """(6,) SE(3) log of the edge error."""
    return se3_log(mat_inv(T_meas) @ X_i @ mat_inv(X_j))


def robust_omega(s2: jnp.ndarray, robust: str, delta: float) -> jnp.ndarray:
    """IRLS weight rho'(s2) for squared residual norms s2 (branch-free)."""
    if robust == "none":
        return jnp.ones_like(s2)
    if robust == "huber":
        return jnp.minimum(1.0, delta * jax.lax.rsqrt(jnp.maximum(s2, 1e-24)))
    if robust == "dcs":
        return jnp.minimum(1.0, 2.0 * delta * delta / (delta * delta + s2))
    raise ValueError(f"unknown robust kernel {robust!r}")


def robust_rho(s2: jnp.ndarray, robust: str, delta: float) -> jnp.ndarray:
    """Robustified per-edge cost rho(s2) (so rho=s2 for the L2 kernel)."""
    if robust == "none":
        return s2
    if robust == "huber":
        s = jnp.sqrt(jnp.maximum(s2, 1e-24))
        return jnp.where(s <= delta, s2, 2.0 * delta * s - delta * delta)
    if robust == "dcs":
        # rho(s2) = s2 * omega * (2 - omega): the scaled residual's
        # contribution at the DCS stationary point (omega clamped at 1).
        om = jnp.minimum(1.0, 2.0 * delta * delta / (delta * delta + s2))
        return s2 * om * (2.0 - om)
    raise ValueError(f"unknown robust kernel {robust!r}")


def _robust_edge_weight(g: PoseGraph, robust: str, delta: float) -> jnp.ndarray:
    """(E,) IRLS multiplier omega(||w r||) for the configured robust kernel.

    Loop edges are produced by RANSAC over descriptor matches; a perceptually
    aliased pair (two corridor corners that look alike) yields a confidently
    WRONG edge whose residual no inlier threshold can catch -- the c3
    edge-quality sweep measured weak edges RAISING ATE (BASELINE.md c3 row).
    Robust kernels bound each edge's influence:

      huber: omega = min(1, delta/||r||)      -- linear tail, bounded gradient
      dcs:   omega = min(1, 2 delta^2/(delta^2+||r||^2))  -- Dynamic Covariance
             Scaling (Agarwal et al., ICRA 2013): the closed-form stationary
             point of a switchable constraint, so a gross outlier's influence
             -> 0 instead of merely growing linearly.

    Recomputed every GN iteration from the CURRENT estimate (IRLS); applied as
    sqrt(omega) on the weighted residual/Jacobians so the normal equations are
    those of the robustified cost. All branch-free, shapes static.
    """
    if robust == "none":
        return jnp.ones_like(g.w)
    r = jax.vmap(lambda Xi, Xj, Tm, w: w * edge_residual(Xi, Xj, Tm))(
        g.X[g.ei], g.X[g.ej], g.T_meas, g.w)
    return robust_omega(jnp.sum(r * r, axis=-1), robust, delta)


def _robust_cost(g: PoseGraph, robust: str, delta: float,
                 axis_name: str | None) -> jnp.ndarray:
    """Total robustified cost sum_e rho(||w_e r_e||^2) / 2 (accept/reject metric).

    Must be the rho-cost, not the reweighted quadratic: IRLS accept/reject on
    the quadratic of stale weights is not monotone in the true objective.
    """
    r = jax.vmap(lambda Xi, Xj, Tm, w: w * edge_residual(Xi, Xj, Tm))(
        g.X[g.ei], g.X[g.ej], g.T_meas, g.w)
    cost = 0.5 * jnp.sum(robust_rho(jnp.sum(r * r, axis=-1), robust, delta))
    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)
    return cost


def _edge_jacobians(X_i, X_j, T_meas, w):
    """Weighted residual + Jacobians wrt the two endpoint tangents."""

    def res(di, dj):
        return w * edge_residual(se3_exp(di) @ X_i, se3_exp(dj) @ X_j, T_meas)

    zero = jnp.zeros(6, dtype=X_i.dtype)
    r = res(zero, zero)
    J_i, J_j = jax.jacfwd(res, argnums=(0, 1))(zero, zero)  # (6,6) each
    return r, J_i, J_j


def build_system(g: PoseGraph, axis_name: str | None = None):
    """Assemble (H, b, cost) of the damped GN normal equations.

    Under edge sharding (`axis_name` inside shard_map), the per-shard partial
    sums are psummed -- H/b are sums over edges.
    """
    N = g.X.shape[0]
    r, J_i, J_j = jax.vmap(_edge_jacobians)(g.X[g.ei], g.X[g.ej], g.T_meas, g.w)

    Hii = jnp.einsum("eri,erj->eij", J_i, J_i)
    Hjj = jnp.einsum("eri,erj->eij", J_j, J_j)
    Hij = jnp.einsum("eri,erj->eij", J_i, J_j)
    bi = jnp.einsum("eri,er->ei", J_i, r)
    bj = jnp.einsum("eri,er->ei", J_j, r)

    H = jnp.zeros((N, N, 6, 6), g.X.dtype)
    H = H.at[g.ei, g.ei].add(Hii)
    H = H.at[g.ej, g.ej].add(Hjj)
    H = H.at[g.ei, g.ej].add(Hij)
    H = H.at[g.ej, g.ei].add(jnp.swapaxes(Hij, -1, -2))
    b = jnp.zeros((N, 6), g.X.dtype)
    b = b.at[g.ei].add(bi)
    b = b.at[g.ej].add(bj)
    cost = 0.5 * jnp.sum(r * r)
    if axis_name is not None:
        H = jax.lax.psum(H, axis_name)
        b = jax.lax.psum(b, axis_name)
        cost = jax.lax.psum(cost, axis_name)
    return H, b, cost


def pgo_cost(g: PoseGraph, axis_name: str | None = None) -> jnp.ndarray:
    r = jax.vmap(lambda Xi, Xj, Tm, w: w * edge_residual(Xi, Xj, Tm))(
        g.X[g.ei], g.X[g.ej], g.T_meas, g.w)
    cost = 0.5 * jnp.sum(r * r)
    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)
    return cost


def _edge_terms(g: PoseGraph):
    """Per-edge weighted residual + endpoint Jacobians, vmapped."""
    return jax.vmap(_edge_jacobians)(g.X[g.ei], g.X[g.ej], g.T_meas, g.w)


def _node_clamp(g: PoseGraph, anchor) -> jnp.ndarray:
    """(N,) gauge/invalid-slot prior strength multiplier."""
    N = g.X.shape[0]
    one_hot = (jnp.arange(N) == anchor).astype(g.X.dtype)
    return jnp.maximum(one_hot, 1.0 - g.node_valid.astype(g.X.dtype))


def _pcg(matvec, precond, b, iters: int, dot=None):
    """Preconditioned conjugate gradients, fixed iteration count (lax.scan).

    The pose-graph Hessian is block-tridiagonal-plus-loop-edges -- CG with a
    block-Jacobi preconditioner is the SURVEY.md C14 'fixed-pattern sparse
    solve'. All shapes static; convergence handled by the fixed budget plus
    an alpha guard (alpha -> 0 once the residual underflows).

    `dot` is pluggable so sharded callers can psum the reductions (the
    time-sharded solver in sosvo/dist/pgo_time.py passes a psummed dot).
    """
    eps = jnp.asarray(1e-30, b.dtype)

    if dot is None:
        def dot(a, c):
            return jnp.sum(a * c)

    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = dot(r, z)

    def body(carry, _):
        x, r, z, p, rz = carry
        Ap = matvec(p)
        alpha = rz / jnp.maximum(dot(p, Ap), eps)
        x2 = x + alpha * p
        r2 = r - alpha * Ap
        z2 = precond(r2)
        rz2 = dot(r2, z2)
        beta = rz2 / jnp.maximum(rz, eps)
        p2 = z2 + beta * p
        return (x2, r2, z2, p2, rz2), None

    (x, *_), _ = jax.lax.scan(body, (x, r, z, p, rz), None, length=iters)
    return x


def _gn_step_cg(g: PoseGraph, lam, axis_name, anchor, cg_iters: int):
    """One damped GN step with a matrix-free CG solve: O(E) memory instead of
    the dense path's O(N^2) blocks, so pose graphs scale to long trajectories
    (SURVEY.md SS5.7 'long context'). Under edge sharding the matvec psums per
    CG iteration -- the same collective pattern as the BA Schur reduction."""
    r, J_i, J_j = _edge_terms(g)
    N = g.X.shape[0]

    b = jnp.zeros((N, 6), g.X.dtype)
    b = b.at[g.ei].add(jnp.einsum("erc,er->ec", J_i, r))
    b = b.at[g.ej].add(jnp.einsum("erc,er->ec", J_j, r))
    # Block-Jacobi preconditioner blocks: the diagonal of H.
    D = jnp.zeros((N, 6, 6), g.X.dtype)
    D = D.at[g.ei].add(jnp.einsum("eri,erj->eij", J_i, J_i))
    D = D.at[g.ej].add(jnp.einsum("eri,erj->eij", J_j, J_j))
    if axis_name is not None:
        b = jax.lax.psum(b, axis_name)
        D = jax.lax.psum(D, axis_name)

    diag_add = lam + GAUGE_PRIOR * _node_clamp(g, anchor)  # (N,)
    D = D + diag_add[:, None, None] * jnp.eye(6, dtype=g.X.dtype)

    def matvec(v):
        t = jnp.einsum("erc,ec->er", J_i, v[g.ei]) + jnp.einsum("erc,ec->er", J_j, v[g.ej])
        u = jnp.zeros_like(v)
        u = u.at[g.ei].add(jnp.einsum("erc,er->ec", J_i, t))
        u = u.at[g.ej].add(jnp.einsum("erc,er->ec", J_j, t))
        if axis_name is not None:
            u = jax.lax.psum(u, axis_name)
        return u + diag_add[:, None] * v

    # Invert the block-diagonal ONCE (closed-form SPD inverse) instead of a
    # batched LU solve inside every PCG iteration.
    Dinv = inv6x6_spd(D)

    def precond(v):
        return jnp.einsum("nij,nj->ni", Dinv, v)

    delta = _pcg(matvec, precond, -b, cg_iters)
    clamp = _node_clamp(g, anchor)
    delta = delta * (1.0 - clamp)[:, None]
    X_new = jnp.einsum("nij,njk->nik", se3_exp(delta), g.X)
    return g._replace(X=X_new)


def _gn_step(g: PoseGraph, lam, axis_name, anchor):
    N = g.X.shape[0]
    H, b, _ = build_system(g, axis_name)
    eye6 = jnp.eye(6, dtype=g.X.dtype)
    one_hot = (jnp.arange(N) == anchor).astype(g.X.dtype)
    # Invalid node slots get the gauge prior too so H stays nonsingular.
    clamp = jnp.maximum(one_hot, 1.0 - g.node_valid.astype(g.X.dtype))
    diag = (lam + GAUGE_PRIOR * clamp)[..., None, None] * eye6
    H = H + jnp.eye(N, dtype=g.X.dtype)[:, :, None, None] * diag[:, None]

    H_flat = H.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
    delta = -jnp.linalg.solve(H_flat, b.reshape(6 * N)).reshape(N, 6)
    delta = delta * (1.0 - clamp)[:, None]
    X_new = jnp.einsum("nij,njk->nik", se3_exp(delta), g.X)
    return g._replace(X=X_new)


def pgo_solve(g: PoseGraph, iters: int = 10, lam0: float = 1e-4,
              axis_name: str | None = None,
              anchor: jnp.ndarray | int = 0,
              solver: str = "dense", cg_iters: int = 32,
              robust: str = "none", robust_delta: float = 0.1) -> PGOResult:
    """Damped GN with accept/reject, fixed iteration count (lax.scan).

    solver="dense": exact 6Nx6N solve (small graphs).
    solver="cg": matrix-free block-Jacobi PCG, O(E) memory -- use for long
      trajectories / sharded edges (SURVEY.md C14 sparse solve).
    robust="huber"|"dcs": IRLS robust kernel over edge residual norms with
      scale `robust_delta` (rad/m mixed SE(3)-tangent units); bounds the
      influence of wrong loop edges (see `_robust_edge_weight`). The reported
      cost/cost0 are then the robustified objective.
    """
    if solver not in ("dense", "cg"):
        raise ValueError(f"unknown solver {solver!r}")
    if robust not in ("none", "huber", "dcs"):
        raise ValueError(f"unknown robust kernel {robust!r}")
    cost0 = _robust_cost(g, robust, robust_delta, axis_name)
    lam = jnp.asarray(lam0, g.X.dtype)

    if axis_name is not None:
        def _to_varying(a):
            a = jnp.asarray(a)
            if axis_name in getattr(jax.typeof(a), "vma", ()):
                return a
            return jax.lax.pcast(a, axis_name, to="varying")

        g, lam, cost0 = jax.tree.map(_to_varying, (g, lam, cost0))

    def body(carry, _):
        gg, lam, cost = carry
        if robust == "none":
            gw = gg
        else:
            # IRLS: fold sqrt(omega) of the CURRENT estimate into the edge
            # weights for this linearization only (gg itself keeps raw w).
            om = _robust_edge_weight(gg, robust, robust_delta)
            gw = gg._replace(w=gg.w * jnp.sqrt(om))
        if solver == "cg":
            cand = _gn_step_cg(gw, lam, axis_name, anchor, cg_iters)
        else:
            cand = _gn_step(gw, lam, axis_name, anchor)
        cand = gg._replace(X=cand.X)
        cand_cost = _robust_cost(cand, robust, robust_delta, axis_name)
        accept = cand_cost < cost
        g_next = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, gg)
        lam_next = jnp.clip(jnp.where(accept, lam / 3.0, lam * 9.0), 1e-9, 1e4)
        return (g_next, lam_next, jnp.where(accept, cand_cost, cost)), accept

    (g_fin, _, cost_fin), accepted = jax.lax.scan(
        body, (g, lam, cost0), None, length=iters)
    return PGOResult(X=g_fin.X, cost=cost_fin, cost0=cost0, accepted=accepted)


# ---------------------------------------------------------------- builders

def odometry_edges(X: jnp.ndarray, node_valid: jnp.ndarray, weight: float = 1.0):
    """Consecutive-node odometry edges from current estimates: (ei, ej, T, w)."""
    n = X.shape[0]
    ei = jnp.arange(1, n, dtype=jnp.int32)
    ej = jnp.arange(0, n - 1, dtype=jnp.int32)
    T = jnp.einsum("nij,njk->nik", X[ei], jax.vmap(mat_inv)(X[ej]))
    w = jnp.where(node_valid[ei] & node_valid[ej], weight, 0.0)
    return ei, ej, T, w
