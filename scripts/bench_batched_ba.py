#!/usr/bin/env python
"""Decompose the batched windowed-BA replay's cost (VERDICT r4 next #3).

At 8 sequences the BA-mode batched replay delivers 1924 f/s vs 3528 for the
f2f curve (BASELINE.md) -- ~45% lost to the keyframe stage. This script
measures, amortized on-chip with the bench.py protocol, the 8-sequence rate
of four ablations so the loss names its stage:

  f2f        run_replay_batched (no keyframe stage at all)
  ba-full    run_replay_ba_batched as shipped
  ba-no-solve  keyframe insertion runs, window solve stubbed to identity
  ba-no-insert both insertion and solve stubbed (cond + bookkeeping only)

Run:  setsid nohup python scripts/bench_batched_ba.py \
          > /tmp/bench_batched_ba.log 2>&1 < /dev/null &
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sosvo_tpu_cache")
    import jax.numpy as jnp

    from sosvo.sensor.rig import default_rig
    from sosvo.synth.scene import make_scene, observe_sequence
    from sosvo.utils.config import PipelineConfig
    from sosvo.vo.batched import (init_batched_ba_states, init_batched_states,
                                  run_replay_ba_batched, run_replay_batched)

    S, N_FRAMES, K, REPS = 8, 10, 512, 8
    rig = default_rig()
    cfg = PipelineConfig()
    keys = jax.random.split(jax.random.PRNGKey(0), S)
    scenes = [make_scene(kk, n_frames=N_FRAMES, n_landmarks=4096) for kk in keys]
    obs = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[observe_sequence(rig, sc, K, kk, pixel_noise=0.3, desc_flip_prob=0.02)
          for sc, kk in zip(scenes, keys)])
    T0 = jnp.stack([sc.poses[0] for sc in scenes])
    obs = jax.block_until_ready(obs)

    def rate(make_replay, states, outs_T, get_T, set_T):
        def block(s0, o):
            def body(_, s):
                fin, outs = make_replay(s, o)
                eps = (jnp.sum(outs_T(outs)) * jnp.float32(1e-38)).astype(jnp.float32)
                return set_T(s, eps)
            return jax.lax.fori_loop(0, REPS, body, s0)

        fn = jax.jit(block)
        jax.block_until_ready(fn(states, obs))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(states, obs))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts) / REPS
        return S * N_FRAMES / t

    results = {}

    st_f2f = init_batched_states(S, K, jax.random.PRNGKey(1), T0=T0)
    results["f2f"] = rate(
        lambda s, o: run_replay_batched(rig, cfg, s, o), st_f2f,
        outs_T=lambda outs: outs.T_world,
        get_T=lambda s: s.T_world,
        set_T=lambda s, eps: s._replace(T_world=s.T_world + eps))

    def ba_variant(name, ba_fn=None, insert_fn=None):
        st = init_batched_ba_states(S, cfg, jax.random.PRNGKey(2), T0=T0)
        results[name] = rate(
            lambda s, o: run_replay_ba_batched(rig, cfg, s, o,
                                               ba_fn=ba_fn, insert_fn=insert_fn),
            st,
            outs_T=lambda outs: outs.vo.T_world,
            get_T=lambda s: s.track.T_world,
            set_T=lambda s, eps: s._replace(
                track=s.track._replace(T_world=s.track.T_world + eps)))

    ba_variant("ba_full")
    ba_variant("ba_no_solve", ba_fn=lambda mm: (mm, jnp.float32(0.0)))
    ba_variant("ba_no_insert", ba_fn=lambda mm: (mm, jnp.float32(0.0)),
               insert_fn=lambda m, *a, **k: m._replace(n_kf=m.n_kf + 1))

    # Pallas kernels under vmap can lower to a per-lane loop; compare the
    # XLA Schur path for the batched solve.
    from sosvo.vo.keyframes import run_window_ba

    ba_variant("ba_xla_schur",
               ba_fn=lambda mm: run_window_ba(rig, mm, iters=cfg.ba.iters,
                                              huber_delta=cfg.ba.huber_delta,
                                              use_pallas=False))
    ba_variant("ba_xla_iters3",
               ba_fn=lambda mm: run_window_ba(rig, mm, iters=3,
                                              huber_delta=cfg.ba.huber_delta,
                                              use_pallas=False))

    for k, v in results.items():
        print(f"{k:14s} {v:8.1f} f/s total @ {S} seqs", flush=True)
    print(json.dumps({"device": str(jax.devices()[0]), "S": S, "K": K,
                      "rates_fps": {k: round(v, 1) for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
