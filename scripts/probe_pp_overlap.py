#!/usr/bin/env python
"""P3-PP probe: does stage-pipelining the REPLAY help on this hardware?

SURVEY.md section 2.2 leaves replay-mode pipeline parallelism (frontend for
chunk i+1 overlapped with geometry/backend for chunk i) as "only if profiling
shows backend stalls the frontend". This measures that, closing VERDICT r2
missing #3 with data instead of a guess:

  A. single-dispatch replay (run_replay_images: lax.map extract -> scan core)
  B. chunked two-dispatch pipeline: extract(chunk k+1) is DISPATCHED while
     replay(chunk k) executes -- JAX async dispatch queues both; any
     frontend/backend overlap the hardware can do happens here.

On one TPU core, XLA executes queued programs in order on a single stream, so
B can only win if dispatch latency hides host-side work (there is none: the
frames are already on-device). Expected and measured: A >= B -- the fused
single dispatch stays the production path, and PP remains live-mode-only
(double-buffered host/device overlap in sosvo/vo/live.py, where real host
work exists to hide).
"""

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sosvo_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from sosvo.frontend.image_frontend import build_frontend_luts, extract_observations
    from sosvo.sensor.rig import default_rig
    from sosvo.synth.render import RoomScene, render_sequence
    from sosvo.synth.scene import make_trajectory
    from sosvo.utils.config import FrontendConfig, PipelineConfig
    from sosvo.vo.image_pipeline import run_replay_images
    from sosvo.vo.pipeline import run_replay
    from sosvo.vo.state import init_track_state

    F, C = args.frames, args.chunk
    rig = default_rig()
    cfg = PipelineConfig(frontend=FrontendConfig(max_features=384,
                                                 pano_height=96, pano_width=768,
                                                 descriptor_patch=16),
                         mode="images")
    room = RoomScene(radius=3.0, floor_z=-1.2, ceiling_z=1.6, texture_scale=2.0)
    poses = make_trajectory(F, radius=0.4)
    imgs = jax.block_until_ready(
        jax.jit(lambda P: render_sequence(rig, P, room))(poses))
    luts = build_frontend_luts(rig, cfg.frontend)
    st = init_track_state(cfg.frontend.max_features, jax.random.PRNGKey(2),
                          T0=poses[0])

    # A: one dispatch for the whole replay.
    replay_a = jax.jit(lambda s, im: run_replay_images(rig, cfg, s, im, luts=luts))
    jax.block_until_ready(replay_a(st, imgs))

    # B: chunked two-stage pipeline, frontend of chunk k+1 queued behind the
    # core replay of chunk k (async dispatch = the pipelining mechanism).
    extract = jax.jit(lambda im: jax.lax.map(
        lambda i: extract_observations(rig, luts, cfg.frontend, i), im))
    core = jax.jit(lambda s, o: run_replay(rig, cfg, s, o))

    def run_b(s):
        outs = []
        obs = extract(imgs[:C])                     # prologue
        for k in range(0, F, C):
            nxt = extract(imgs[k + C:k + 2 * C]) if k + C < F else None
            s, o = core(s, obs)                     # queued behind extract
            outs.append(o.T_world)
            obs = nxt
        return s, jnp.concatenate(outs)

    jax.block_until_ready(run_b(st)[1])

    def timed(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    t_a = timed(lambda: replay_a(st, imgs)[1].T_world)
    t_b = timed(lambda: run_b(st)[1])
    print(json.dumps({
        "device": str(jax.devices()[0]), "frames": F, "chunk": C,
        "single_dispatch_ms_per_frame": round(t_a / F * 1e3, 3),
        "pipelined_ms_per_frame": round(t_b / F * 1e3, 3),
        "pipelining_speedup": round(t_a / t_b, 3),
        "decision": ("adopt chunked pipeline" if t_b < 0.95 * t_a else
                     "single dispatch stays (PP remains live-mode only)"),
    }, indent=2))


if __name__ == "__main__":
    main()
