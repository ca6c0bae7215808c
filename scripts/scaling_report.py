#!/usr/bin/env python
"""Scaling-efficiency report (BASELINE.json:5; VERDICT r1 item 2).

ONE command regenerates the whole artifact:

    python scripts/scaling_report.py          # writes SCALING.json + stdout table

Two legs, honestly labeled:
  1. "chip-saturation": S = 1/2/4/8 sequences batched on the ONE real TPU
     chip (vmap on the data axis). This measures how much of the chip a
     single sequence leaves idle -- the per-chip component of scaling.
  2. "cpu-mesh-mechanics": the 8-virtual-device CPU mesh run of
     sosvo.dist.scaling (subprocess, JAX_PLATFORMS=cpu). The host has 2
     vCPUs, so an 8-device mesh is oversubscribed 4x: these numbers validate
     the sharding MECHANICS (shard placement, collectives, no accidental
     serialization), not ICI bandwidth. The meaningful invariant is that
     total throughput does not crater as devices divide fixed host compute.

Real multi-chip efficiency (>= 80% target) needs a real slice; the identical
code path runs there after sosvo.dist.mesh.init_multihost().
"""

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sosvo_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

REPS = 8          # replays per dispatch (amortizes the ~26 ms tunnel RPC)
N_FRAMES = 10
K = 512


def chip_saturation():
    from sosvo.sensor.rig import default_rig
    from sosvo.synth.scene import make_scene, observe_sequence
    from sosvo.utils.config import PipelineConfig
    from sosvo.vo.batched import init_batched_states, run_replay_batched

    rig = default_rig()
    cfg = PipelineConfig()
    rows = []
    base = None
    # 16/32-sequence rows find the chip-saturation KNEE (VERDICT r4 #6): the
    # honest speed-of-light frames/s/chip headline is the saturated number.
    for S in (1, 2, 4, 8, 16, 32):
        keys = jax.random.split(jax.random.PRNGKey(0), S)
        scenes = [make_scene(kk, n_frames=N_FRAMES, n_landmarks=4096) for kk in keys]
        obs = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[observe_sequence(rig, sc, K, kk, pixel_noise=0.3, desc_flip_prob=0.02)
              for sc, kk in zip(scenes, keys)],
        )
        states = init_batched_states(S, K, jax.random.PRNGKey(1),
                                     T0=jnp.stack([sc.poses[0] for sc in scenes]))

        def block(s0, o):
            # bench.py protocol: REPS replays chained through a vanishing
            # dependency so the loop cannot be hoisted, one dispatch total.
            def body(_, s):
                fin, outs = run_replay_batched(rig, cfg, s, o)
                eps = (jnp.sum(outs.T_world) * jnp.float32(1e-38)).astype(jnp.float32)
                return s._replace(T_world=s.T_world + eps)
            return jax.lax.fori_loop(0, REPS, body, s0)

        fn = jax.jit(block)
        jax.block_until_ready(fn(states, obs))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(states, obs))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts) / REPS
        fps = S * N_FRAMES / t
        if base is None:
            base = fps
        rows.append({"sequences": S, "frames_per_s_total": round(fps, 1),
                     "speedup_vs_1seq": round(fps / base, 2)})
    return {"leg": "chip-saturation", "backend": jax.default_backend(),
            "device": str(jax.devices()[0].device_kind),
            "K": K, "n_frames": N_FRAMES, "rows": rows}


def chip_saturation_ba():
    """Batched WINDOWED-BA saturation: the same curve with the keyframe map
    + Schur window solves in the loop (B:10's full contract)."""
    from sosvo.sensor.rig import default_rig
    from sosvo.synth.scene import make_scene, observe_sequence
    from sosvo.utils.config import PipelineConfig
    from sosvo.vo.batched import init_batched_ba_states, run_replay_ba_batched

    rig = default_rig()
    cfg = PipelineConfig()
    rows = []
    base = None
    for S in (1, 4, 8, 16):
        keys = jax.random.split(jax.random.PRNGKey(0), S)
        scenes = [make_scene(kk, n_frames=N_FRAMES, n_landmarks=4096) for kk in keys]
        obs = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[observe_sequence(rig, sc, K, kk, pixel_noise=0.3, desc_flip_prob=0.02)
              for sc, kk in zip(scenes, keys)],
        )
        states = init_batched_ba_states(S, cfg, jax.random.PRNGKey(1),
                                        T0=jnp.stack([sc.poses[0] for sc in scenes]))

        def block(s0, o):
            def body(_, s):
                fin, outs = run_replay_ba_batched(rig, cfg, s, o)
                eps = (jnp.sum(outs.vo.T_world) * jnp.float32(1e-38)).astype(jnp.float32)
                return s._replace(track=s.track._replace(
                    T_world=s.track.T_world + eps))
            return jax.lax.fori_loop(0, REPS, body, s0)

        fn = jax.jit(block)
        jax.block_until_ready(fn(states, obs))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(states, obs))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts) / REPS
        fps = S * N_FRAMES / t
        if base is None:
            base = fps
        rows.append({"sequences": S, "frames_per_s_total": round(fps, 1),
                     "speedup_vs_1seq": round(fps / base, 2)})
    return {"leg": "chip-saturation-windowed-ba", "backend": jax.default_backend(),
            "device": str(jax.devices()[0].device_kind),
            "K": K, "n_frames": N_FRAMES,
            "window": 5, "keyframe_every": 4, "rows": rows}


def cpu_mesh_mechanics():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "sosvo.dist.scaling", "--devices", "8",
         "--frames", "8", "--seqs-per-dev", "1"],
        capture_output=True, text=True, env=env, timeout=3000, check=True)
    rep = json.loads(out.stdout)
    rep["leg"] = "cpu-mesh-mechanics"
    rep["host_vcpus"] = os.cpu_count()
    return rep


def main():
    report = {"chip_saturation": chip_saturation(),
              "chip_saturation_ba": chip_saturation_ba(),
              "cpu_mesh": cpu_mesh_mechanics()}
    with open(os.path.join(os.path.dirname(__file__), "..", "SCALING.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
