#!/usr/bin/env python
"""Phase breakdown of the long-c3 loop-closure/PGO leg (VERDICT r4 next #1).

The 1024-frame c3 run spends 89.4 s in the PGO leg vs 12.4 s in replay
(BASELINE.md long-c3 row) and no artifact names where that wall goes. This
script reconstructs the leg at its exact c3_long scale in OBSERVATION mode
(the leg consumes FrameObservations, not images, so this is the same compute)
and times each stage separately, reporting BOTH the first-call wall (trace +
compile/cache-load + run -- what one CLI invocation actually pays) and the
amortized re-run wall (pure device execution):

  kf_features   _kf_features: vmapped stereo match+triangulate, 128 keyframes
  prescreen     keyframe_signatures + select_loop_candidates (one matmul)
  pair_match    per-pair KxK Hamming match only        (lax.map over M pairs)
  pair_ransac   per-pair match + 512-hyp rigid RANSAC  (lax.map over M pairs)
  pair_full     match + RANSAC + two-frame BA = loop_edges_for_pairs
  pgo_solve     pgo_solve_time_sharded, 128 nodes + 256 loop edges, dcs

Run on the chip:  setsid nohup python scripts/bench_loop_phases.py \
                      > /tmp/loop_phases.log 2>&1 < /dev/null &
Writes LOOP_PHASES.json at the repo root.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sosvo_tpu_cache")
    import jax.numpy as jnp

    from sosvo.dist.mesh import DATA_AXIS, data_mesh
    from sosvo.dist.pgo_time import TimeShardedGraph, pgo_solve_time_sharded
    from sosvo.frontend.match import match, metric_params
    from sosvo.geom.lie import mat_inv
    from sosvo.geometry.ransac import ransac_rigid
    from sosvo.sensor.rig import default_rig
    from sosvo.synth.scene import make_scene, observe_sequence
    from sosvo.utils.config import (BAConfig, FrontendConfig, PipelineConfig,
                                    RansacConfig)
    from sosvo.vo.loop_closure import (_kf_features, keyframe_signatures,
                                       loop_edges_for_pairs,
                                       select_loop_candidates)

    # c3_long_sharded scale: 128 keyframes, K=1024 features, 512 hyps,
    # 256 candidates, min_inliers=150, dcs PGO.
    N_KF, K, M, MIN_INL = 128, 1024, 256, 150
    cfg = PipelineConfig(
        frontend=FrontendConfig(max_features=K),
        ransac=RansacConfig(n_hyps=512),
        ba=BAConfig(window=5, max_landmarks=1024, iters=5),
    )
    rig = default_rig()
    scene = make_scene(jax.random.PRNGKey(0), n_frames=N_KF, n_landmarks=16384)
    obs_kf = observe_sequence(rig, scene, K, jax.random.PRNGKey(1),
                              pixel_noise=0.3, desc_flip_prob=0.02)
    # Drain the async scene/observation queue BEFORE the first timer: the
    # first timed stage otherwise absorbs the whole data-generation pipeline
    # (measured: "kf_features first 55 s" that was really observe_sequence).
    obs_kf = jax.block_until_ready(obs_kf)

    out = {"n_kf": N_KF, "k": K, "m_candidates": M, "device": str(jax.devices()[0])}
    phases = {}

    def timed(name, fn, *args, reps=3):
        t0 = time.perf_counter()
        r = jax.block_until_ready(fn(*args))
        first = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        rerun = sorted(ts)[len(ts) // 2]
        phases[name] = {"first_s": round(first, 3), "rerun_s": round(rerun, 4)}
        print(f"{name:12s} first {first:8.3f} s   rerun {rerun:8.4f} s",
              flush=True)
        return r

    # --- stage 1: keyframe features (vmapped stereo match + triangulation)
    f_feat = jax.jit(lambda o: _kf_features(rig, cfg, o))
    feats = timed("kf_features", f_feat, obs_kf)
    pts, desc, ray_t, ray_b, valid = feats

    # --- stage 2: signature prescreen
    def f_prescreen(desc, valid):
        sig = keyframe_signatures(desc, valid)
        return select_loop_candidates(sig, 3, M)

    pi, pj, pair_ok = timed("prescreen", jax.jit(f_prescreen), desc, valid)
    keys = jax.random.split(jax.random.PRNGKey(17), M)

    # --- stage 3a: per-pair match only
    metric, max_dist = metric_params(cfg.frontend)

    def match_only(args):
        i, j, _ = args
        m = match(desc[i], desc[j], valid[i], valid[j], max_distance=max_dist,
                  ratio=cfg.frontend.match_ratio, metric=metric)
        return jnp.sum(m.valid)

    f_match = jax.jit(lambda a, b, k: jax.lax.map(match_only, (a, b, k),
                                                  batch_size=8))
    timed("pair_match", f_match, pi, pj, keys)

    # --- stage 3b: match + RANSAC (no BA)
    def match_ransac(args):
        i, j, k = args
        m = match(desc[i], desc[j], valid[i], valid[j], max_distance=max_dist,
                  ratio=cfg.frontend.match_ratio, metric=metric)
        pair_valid = m.valid & valid[i] & valid[j][m.idx_b]
        rr = ransac_rigid(k, pts[i], pts[j][m.idx_b], pair_valid,
                          rays_curr=ray_t[j][m.idx_b],
                          n_hyps=cfg.ransac.n_hyps,
                          angle_threshold=cfg.ransac.rigid_angle_threshold,
                          min_inliers=MIN_INL)
        return rr.num_inliers

    f_mr = jax.jit(lambda a, b, k: jax.lax.map(match_ransac, (a, b, k),
                                               batch_size=8))
    timed("pair_ransac", f_mr, pi, pj, keys)

    # --- stage 3c: the full per-pair worker (match + RANSAC + two-frame BA)
    worker = functools.partial(loop_edges_for_pairs, rig, cfg,
                               min_inliers=MIN_INL)
    f_full = jax.jit(lambda f, a, b, k: worker(f, a, b, k))
    T_meas, w = timed("pair_full", f_full, feats, pi, pj, keys)
    w = w * pair_ok.astype(w.dtype)

    # --- stage 4: the time-sharded PGO solve (1-device mesh, same as chip CLI)
    X_kf = jax.vmap(mat_inv)(scene.poses[:N_KF])
    T_next = jnp.concatenate([X_kf[1:], X_kf[:1]])
    T_odo = jnp.einsum("nij,njk->nik", T_next, jax.vmap(mat_inv)(X_kf))
    w_odo = jnp.where(jnp.arange(N_KF) < N_KF - 1, 1.0, 0.0).astype(jnp.float32)
    g = TimeShardedGraph(
        X=X_kf, node_valid=jnp.ones((N_KF,), bool), T_odo=T_odo, w_odo=w_odo,
        loop_i=pj.astype(jnp.int32), loop_j=pi.astype(jnp.int32),
        T_loop=T_meas, w_loop=w)
    mesh = data_mesh(min(jax.device_count(), 8))
    f_pgo = lambda gg: pgo_solve_time_sharded(mesh, DATA_AXIS, gg, iters=10,
                                              robust="dcs", robust_delta=0.1)
    timed("pgo_solve", f_pgo, g)

    out["phases"] = phases
    out["note"] = ("first_s = trace + compile/cache-load + run (what one CLI "
                   "process pays); rerun_s = warm re-dispatch. Observation-mode "
                   "reconstruction of the c3_long loop leg at exact scale.")
    (ROOT / "LOOP_PHASES.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
