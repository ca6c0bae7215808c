#!/usr/bin/env python
"""Amortized on-chip per-frame rate for an image-native pipeline config
(default c3; pass --config configs/c2_chip_ba.json for the c2 row).

Measures the two in-device legs separately (the CLI's wall number includes
rendering, checkpointing and per-chunk RPC): frontend extraction at K=2048
on the 128x1024 panorama pair, and the geometry replay. bench.py protocol:
REPS chained inside one dispatch.
"""

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

from sosvo.frontend.image_frontend import build_frontend_luts, extract_observations
from sosvo.sensor.rig import default_rig
from sosvo.synth.render import RoomScene, render_sequence
from sosvo.synth.scene import make_trajectory
from sosvo.utils.config import load_pipeline_config
from sosvo.vo.pipeline import run_replay
from sosvo.vo.state import init_track_state

REPS = 8
F = 32


def timed(fn, *args):
    block = jax.jit(fn)
    jax.block_until_ready(block(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(block(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / REPS


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/c3_host_pgo.json",
                    help="preset whose frontend/ransac sizes to measure "
                         "(e.g. configs/c2_chip_ba.json for the c2 row)")
    args = ap.parse_args()
    cfg = load_pipeline_config(args.config)
    rig = default_rig(image_size=768)
    room = RoomScene(radius=3.0, floor_z=-1.2, ceiling_z=1.6, texture_scale=2.0)
    poses = make_trajectory(F, radius=0.4)
    imgs = jax.jit(lambda P: render_sequence(rig, P, room))(poses)
    luts = build_frontend_luts(rig, cfg.frontend)

    def extract_block(ims):
        def body(_, carry):
            obs = jax.lax.map(
                lambda im: extract_observations(rig, luts, cfg.frontend, im), carry)
            eps = (jnp.sum(obs.ray_top) * jnp.float32(1e-38)).astype(ims.dtype)
            return carry + eps
        return jax.lax.fori_loop(0, REPS, body, ims)

    t_ex = timed(extract_block, imgs) / F

    obs = jax.jit(lambda ims: jax.lax.map(
        lambda im: extract_observations(rig, luts, cfg.frontend, im), ims))(imgs)
    state = init_track_state(cfg.frontend.max_features, jax.random.PRNGKey(2),
                             T0=poses[0])

    def replay_block(s0, o):
        def body(_, s):
            fin, outs = run_replay(rig, cfg, s, o)
            eps = (jnp.sum(outs.T_world) * jnp.float32(1e-38)).astype(jnp.float32)
            return s._replace(T_world=s.T_world + eps)
        return jax.lax.fori_loop(0, REPS, body, s0)

    t_re = timed(replay_block, state, obs) / F
    per_frame = t_ex + t_re
    print(json.dumps({
        "config": args.config,
        "K": cfg.frontend.max_features,
        "pano": [cfg.frontend.pano_height, cfg.frontend.pano_width],
        "extract_ms_per_frame": round(t_ex * 1e3, 3),
        "replay_ms_per_frame": round(t_re * 1e3, 3),
        "frames_per_s_on_chip": round(1.0 / per_frame, 1),
    }))


if __name__ == "__main__":
    main()
