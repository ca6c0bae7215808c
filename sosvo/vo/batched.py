"""Batched multi-sequence replay: vmap over sequences, sharded on "data".

Benchmark config c4 (BASELINE.json:10: "4 sequences in parallel via vmap with
shared ... kernels, 1 host"). The per-frame step is already pure over pytrees,
so batching is `jax.vmap` over a leading sequence axis; placing that axis on
the mesh's "data" axis (SURVEY.md P1-DP) makes XLA partition every kernel --
matcher, RANSAC, refine -- across chips with zero code changes. On one chip
the vmap still pays off: the matcher's MXU matmuls and the RANSAC SVD batch
grow by the sequence count, improving hardware utilization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sosvo.dist.mesh import DATA_AXIS
from sosvo.sensor.rig import OmnistereoRig
from sosvo.synth.scene import FrameObservations
from sosvo.utils.config import PipelineConfig
from sosvo.vo.pipeline import step
from sosvo.vo.state import StepOutput, TrackState, init_track_state


def init_batched_states(n_seq: int, max_features: int, key: jax.Array,
                        T0: jnp.ndarray | None = None) -> TrackState:
    """Stacked TrackStates, leading axis = sequence."""
    keys = jax.random.split(key, n_seq)
    T0s = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n_seq, 1, 1)) if T0 is None else T0
    return jax.vmap(lambda k, T: init_track_state(max_features, k, T0=T))(keys, T0s)


def run_replay_batched(
    rig: OmnistereoRig,
    cfg: PipelineConfig,
    states: TrackState,
    obs_seqs: FrameObservations,
) -> tuple[TrackState, StepOutput]:
    """Replay S sequences in lockstep: obs fields are (S, F, ...).

    Scan over frames of a vmapped step (scan-of-vmap, not vmap-of-scan, so
    the compiled program is a single loop whose body is batch-parallel --
    the layout that shards cleanly over the "data" mesh axis).

    The essential gate is DEFERRED out of the vmapped step and applied with
    one any(lane.need) `lax.cond` per scan step (`apply_deferred_gate`): a
    per-lane lazy cond would lower to select under vmap and run the 2D-2D
    RANSAC for every lane every frame. Measured on v5e (K=512): total
    batched throughput 853/1697/2018/2120 -> see SCALING.json for the
    deferred-gate curve.
    """
    from sosvo.vo.pipeline import apply_deferred_gate, step_full

    def body(s, o):
        T_world_old = s.T_world                       # (S, 4, 4) pre-step
        s2, out, _feats, ctx = jax.vmap(
            lambda st, ob: step_full(rig, cfg, st, ob, defer_gate=True))(s, o)
        s2, out = apply_deferred_gate(cfg, T_world_old, s2, out, ctx)
        return s2, out

    obs_fmajor = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), obs_seqs)  # (F, S, ...)
    final, outs = jax.lax.scan(body, states, obs_fmajor)
    return final, jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), outs)     # (S, F, ...)


def init_batched_ba_states(n_seq: int, cfg: PipelineConfig, key: jax.Array,
                           T0: jnp.ndarray | None = None):
    """Stacked BAStates (track + keyframe map), leading axis = sequence."""
    from sosvo.vo.ba_pipeline import init_ba_state

    keys = jax.random.split(key, n_seq)
    T0s = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n_seq, 1, 1)) if T0 is None else T0
    return jax.vmap(lambda k, T: init_ba_state(cfg, k, T0=T))(keys, T0s)


def run_replay_ba_batched(
    rig: OmnistereoRig,
    cfg: PipelineConfig,
    states,
    obs_seqs: FrameObservations,
    ba_fn=None,
    insert_fn=None,
):
    """Replay S sequences in lockstep WITH windowed BA (B:10's full contract:
    the batched path shares the Schur/BA kernels, not just the f2f step).

    MapState is a fixed-shape pytree, so `jax.vmap(step_ba)` batches the
    keyframe map, landmark insertion, and the window solve per sequence with
    no code changes; on the "data" mesh every BA matmul partitions like the
    f2f kernels do.

    Keyframing is forced to the LOCKSTEP STRIDE schedule: all lanes start at
    the same frame index, so the stride decision is one scalar per scan step,
    computed OUTSIDE the vmap and passed via `is_kf_override` -- keeping the
    keyframe `lax.cond` a real cond (a per-lane predicate would lower to
    select and run the BA solve every frame for every lane). Adaptive
    keyframing is per-lane by nature and therefore not supported batched;
    callers get the stride schedule regardless of `cfg.keyframe_mode`.

    The essential gate is likewise deferred out of the vmapped f2f core and
    resolved once per scan step (`pipeline.apply_deferred_gate`) BEFORE the
    keyframe stage consumes the pose -- both the gate skip and the keyframe
    cond stay real conditionals in the batched program.

    `ba_fn` / `insert_fn` override the window solve / keyframe insertion
    per lane (bench ablation + distributed callers).
    """
    from sosvo.vo.ba_pipeline import step_ba_post
    from sosvo.vo.pipeline import apply_deferred_gate, step_full

    def body(s, o):
        # Lanes are in lockstep: lane 0's frame counter IS the scalar frame.
        frame = s.track.frame_idx[0]
        is_kf = jnp.mod(frame, cfg.keyframe_every) == 0
        T_world_old = s.track.T_world                 # (S, 4, 4) pre-step
        track2, out, feats, ctx = jax.vmap(
            lambda st, ob: step_full(rig, cfg, st, ob, defer_gate=True))(
            s.track, o)
        track2, out = apply_deferred_gate(cfg, T_world_old, track2, out, ctx)
        return jax.vmap(lambda st, tr, ou, fe: step_ba_post(
            rig, cfg, st, tr, ou, fe, is_kf_override=is_kf,
            ba_fn=ba_fn, insert_fn=insert_fn))(
            s, track2, out, feats)

    obs_fmajor = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), obs_seqs)  # (F, S, ...)
    final, outs = jax.lax.scan(body, states, obs_fmajor)
    return final, jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), outs)     # (S, F, ...)


def shard_batched_inputs(mesh: Mesh, states: TrackState, obs_seqs: FrameObservations):
    """Place the sequence axis on the "data" mesh axis, everything else replicated."""

    def put(tree):
        def leaf(a):
            spec = P(DATA_AXIS) if getattr(a, "ndim", 0) >= 1 else P()
            return jax.device_put(a, NamedSharding(mesh, spec))
        return jax.tree.map(leaf, tree)

    return put(states), put(obs_seqs)
