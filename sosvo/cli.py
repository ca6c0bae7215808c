"""Replay driver CLI: run a benchmark config end-to-end.

Usage:
    python -m sosvo.cli --config configs/c1_cpu_smoke.json --out /tmp/run1
    python -m sosvo.cli --config ... --ckpt-every 8 --fault-inject 17
    python -m sosvo.cli --config ... --resume         # continue after a kill

Replaces the reference's driver scripts (SURVEY.md C15/SS3.1) with a config-
driven harness: builds the synthetic world, replays the jitted pipeline in
CHUNKS (checkpointing the full tracking pytree between chunks -- SURVEY.md
section 5.3/5.4), logs per-frame JSONL, reports ATE/RPE + frames/s.
`--fault-inject N` kills the process after frame N to prove resume
correctness (the resumed trajectory must equal the uninterrupted one).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", default="/tmp/sosvo_run")
    ap.add_argument("--ckpt-every", type=int, default=16, help="frames per chunk/checkpoint")
    ap.add_argument("--fault-inject", type=int, default=-1,
                    help="kill the process after this frame (tests resume)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--mode", choices=["f2f", "ba"], default="ba",
                    help="frame-to-frame only, or keyframed windowed-BA VO")
    ap.add_argument("--source", choices=["obs", "images"], default=None,
                    help="feature observations (c1) or rendered raw omni "
                         "images through the full frontend (c2); defaults to "
                         "the config's pipeline.mode")
    ap.add_argument("--pgo", action="store_true",
                    help="pose-graph loop closing at the end (or set "
                         "pipeline.pose_graph in the config, as c3 does)")
    ap.add_argument("--platform", default=None, help="override jax platform (e.g. cpu)")
    ap.add_argument("--viz", action="store_true",
                    help="write visualization artifacts to --out: trajectory "
                         "plot, 3D landmark map + PLY point cloud (ba mode), "
                         "keypoint/stereo-match overlays (image mode)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sosvo_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from sosvo.eval.ate import ate_rmse, rpe
    from sosvo.sensor.rig import default_rig
    from sosvo.synth.scene import make_scene, observe_sequence
    from sosvo.utils.checkpoint import latest_step, restore_state, save_state
    from sosvo.utils.config import load_pipeline_config
    from sosvo.utils.framelog import stepoutput_rows, write_jsonl
    from sosvo.vo.ba_pipeline import init_ba_state, run_replay_ba
    from sosvo.vo.loop_closure import pgo_refine_trajectory
    from sosvo.vo.pipeline import run_replay
    from sosvo.vo.state import init_track_state

    with open(args.config) as f:
        raw = json.load(f)
    run = raw.get("run", {})
    cfg = load_pipeline_config(args.config)
    n_frames = int(run.get("n_frames", 10))
    n_landmarks = int(run.get("n_landmarks", 4096))
    pixel_noise = float(run.get("pixel_noise", 0.3))
    desc_flip = float(run.get("desc_flip_prob", 0.02))
    K = cfg.frontend.max_features

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    ckpt_dir = out / "ckpt"
    log_path = out / "frames.jsonl"

    source = args.source or ("images" if cfg.mode == "images" else "obs")
    rig = default_rig()
    scene = make_scene(jax.random.PRNGKey(0), n_frames=n_frames, n_landmarks=n_landmarks)
    if source == "images":
        # Full frontend path (config c2): ray-cast the analytic room through
        # the exact sensor model, then detect/describe/match from pixels.
        from sosvo.frontend.image_frontend import build_frontend_luts, extract_observations
        from sosvo.synth.render import RoomScene, render_sequence
        from sosvo.synth.scene import make_trajectory

        room = RoomScene(radius=3.0, floor_z=-1.2, ceiling_z=1.6, texture_scale=2.0)
        poses = make_trajectory(n_frames, radius=0.4)
        scene = scene._replace(poses=poses)
        imgs = jax.jit(lambda P: render_sequence(rig, P, room))(poses)
        luts = build_frontend_luts(rig, cfg.frontend)
        extract = jax.jit(jax.vmap(lambda im: extract_observations(rig, luts, cfg.frontend, im)))
        obs = extract(imgs)
    else:
        obs = observe_sequence(rig, scene, K, jax.random.PRNGKey(1),
                               pixel_noise=pixel_noise, desc_flip_prob=desc_flip)

    if args.mode == "ba":
        state0 = init_ba_state(cfg, jax.random.PRNGKey(2), T0=scene.poses[0])
        replay = jax.jit(lambda s, o: run_replay_ba(rig, cfg, s, o))
        get_T = lambda o: o.vo.T_world
        get_vo = lambda o: o.vo
    else:
        state0 = init_track_state(K, jax.random.PRNGKey(2), T0=scene.poses[0])
        replay = jax.jit(lambda s, o: run_replay(rig, cfg, s, o))
        get_T = lambda o: o.T_world
        get_vo = lambda o: o

    start_frame = 0
    state = state0
    if args.resume:
        step = latest_step(ckpt_dir)
        if step is not None:
            state = restore_state(ckpt_dir, step, state0)
            start_frame = step
            print(f"[sosvo] resumed from checkpoint at frame {step}")

    chunk = max(1, args.ckpt_every)
    all_T = []
    t0 = time.perf_counter()
    f = start_frame
    append = args.resume and start_frame > 0
    while f < n_frames:
        hi = min(f + chunk, n_frames)
        obs_chunk = jax.tree.map(lambda x: x[f:hi], obs)
        state, outs = jax.block_until_ready(replay(state, obs_chunk))
        vo = get_vo(outs)
        all_T.append(np.asarray(get_T(outs)))
        write_jsonl(log_path, stepoutput_rows(vo, t_offset=f), append=append)
        append = True
        save_state(ckpt_dir, hi, state)
        if 0 <= args.fault_inject < hi:
            print(f"[sosvo] fault injection: dying after frame {hi}")
            sys.stdout.flush()
            import os as _os
            _os._exit(42)
        f = hi
    wall = time.perf_counter() - t0

    T_est = jnp.asarray(np.concatenate(all_T, axis=0))
    gt = scene.poses[start_frame:]
    n_loops = 0
    if args.pgo or cfg.pose_graph:
        T_full = T_est if start_frame == 0 else jnp.concatenate(
            [scene.poses[:start_frame], T_est])
        T_full, n_loops = pgo_refine_trajectory(
            rig, cfg, obs, T_full,
            min_inliers=cfg.loop_min_inliers,
            max_candidates=cfg.loop_candidates or None,
            robust=cfg.pgo_robust, robust_delta=cfg.pgo_robust_delta)
        T_est = T_full[start_frame:]
        n_loops = int(n_loops)

    rmse, _ = ate_rmse(T_est[1:, :3, 3], gt[1:, :3, 3])
    if T_est.shape[0] > 2:
        t_rpe, r_rpe = rpe(T_est[1:], gt[1:])
    else:  # a resumed tail can be a single pose pair; RPE needs >= 2
        t_rpe = r_rpe = jnp.float32(0.0)
    done = n_frames - start_frame
    report = {
        "config": args.config,
        "frames": done,
        "ate_rmse_m": round(float(rmse), 6),
        "rpe_t_m": round(float(t_rpe), 6),
        "rpe_r_rad": round(float(r_rpe), 6),
        "frames_per_s": round(done / wall, 2),
        "wall_s": round(wall, 2),
        "mode": args.mode,
        "pgo_loops": n_loops,
        "device": str(jax.devices()[0]),
    }
    (out / "report.json").write_text(json.dumps(report, indent=2))

    if args.viz:
        from sosvo.eval.plots import plot_trajectories
        from sosvo.eval.viz import (keypoint_overlay, match_overlay, plot_map_3d,
                                    save_ply)

        plot_trajectories(np.asarray(T_est), np.asarray(gt), out / "trajectory.png",
                          title=f"{Path(args.config).stem}: ATE {float(rmse):.4f} m")
        artifacts = ["trajectory.png"]
        if args.mode == "ba":
            lm = np.asarray(state.map.lm_pos)
            lv = np.asarray(state.map.lm_valid)
            n_pts = save_ply(out / "map.ply", lm, valid=lv)
            plot_map_3d(out / "map_3d.png", np.asarray(T_est), lm, lv,
                        traj_gt=np.asarray(gt),
                        title=f"landmark map ({n_pts} points)")
            artifacts += ["map.ply", "map_3d.png"]
        if source == "images":
            from sosvo.vo.pipeline import _match, azimuth_of

            o0 = jax.tree.map(lambda x: x[0], obs)
            keypoint_overlay(out / "keypoints.png", np.asarray(imgs[0]),
                             np.asarray(o0.uv_top), np.asarray(o0.valid_top),
                             np.asarray(o0.uv_bottom), np.asarray(o0.valid_bottom))
            m = _match(cfg, o0.desc_top, o0.desc_bottom, o0.valid_top,
                       o0.valid_bottom, az_a=azimuth_of(o0.ray_top),
                       az_b=azimuth_of(o0.ray_bottom),
                       band=cfg.frontend.stereo_band_rad)
            match_overlay(out / "matches.png", np.asarray(imgs[0]),
                          np.asarray(o0.uv_top),
                          np.asarray(o0.uv_bottom[m.idx_b]), np.asarray(m.valid))
            artifacts += ["keypoints.png", "matches.png"]
        print(f"[sosvo] viz artifacts: {', '.join(artifacts)}")

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
