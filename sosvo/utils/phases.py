"""Per-phase timing breakdown of the VO step (SURVEY.md section 5.1).

Times each pipeline stage as its own jitted function on the live backend --
panorama warp, detect+describe, stereo match, triangulation, temporal match,
RANSAC, refine, window BA -- so regressions localize to a phase and the
per-kernel speed-of-light comparison (BASELINE.md) has measured numbers.

Run:  python -m sosvo.utils.phases [--k 512] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json


def phase_breakdown(k: int = 512, n_landmarks: int = 4096, reps: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from sosvo.backend.refine import refine_pose_bearings
    from sosvo.geometry.ransac import ransac_rigid
    from sosvo.geometry.triangulate import midpoint_triangulate
    from sosvo.sensor.model import viewpoint
    from sosvo.sensor.rig import default_rig
    from sosvo.synth.scene import make_scene, observe_frame
    from sosvo.utils.config import PipelineConfig
    from sosvo.utils.profiling import time_jitted
    from sosvo.vo.pipeline import _match, azimuth_of, step
    from sosvo.vo.state import init_track_state

    rig = default_rig()
    cfg = PipelineConfig()
    scene = make_scene(jax.random.PRNGKey(0), n_frames=3, n_landmarks=n_landmarks)
    o0 = observe_frame(rig, scene, jnp.asarray(1), k, jax.random.PRNGKey(1),
                       pixel_noise=0.3)
    o1 = observe_frame(rig, scene, jnp.asarray(2), k, jax.random.PRNGKey(2),
                       pixel_noise=0.3)

    times = {}

    az0 = azimuth_of(o0.ray_top)
    az0b = azimuth_of(o0.ray_bottom)
    f_stereo = jax.jit(lambda d1, d2: _match(cfg, d1, d2, o0.valid_top, o0.valid_bottom,
                                             az_a=az0, az_b=az0b,
                                             band=cfg.frontend.stereo_band_rad))
    times["stereo_match"] = time_jitted(f_stereo, o0.desc_top, o0.desc_bottom, n=reps)

    m = f_stereo(o0.desc_top, o0.desc_bottom)
    f_tri = jax.jit(lambda rt, rb: midpoint_triangulate(
        rt, rb, viewpoint(rig.top), viewpoint(rig.bottom)))
    times["triangulate"] = time_jitted(f_tri, o0.ray_top, o0.ray_bottom[m.idx_b], n=reps)
    tri = f_tri(o0.ray_top, o0.ray_bottom[m.idx_b])

    f_temp = jax.jit(lambda d1, d2: _match(cfg, d1, d2, o0.valid_top, o1.valid_top))
    times["temporal_match"] = time_jitted(f_temp, o0.desc_top, o1.desc_top, n=reps)
    tm = f_temp(o0.desc_top, o1.desc_top)

    valid = m.valid & tri.valid & tm.valid
    f_ransac = jax.jit(lambda key: ransac_rigid(
        key, tri.points, tri.points[tm.idx_b], valid,
        rays_curr=o1.ray_top[tm.idx_b], n_hyps=cfg.ransac.n_hyps))
    times["ransac_rigid"] = time_jitted(f_ransac, jax.random.PRNGKey(3), n=reps)
    rr = f_ransac(jax.random.PRNGKey(3))

    f_refine = jax.jit(lambda T: refine_pose_bearings(
        T, tri.points, o1.ray_top[tm.idx_b], rr.inliers.astype(jnp.float32)))
    times["refine"] = time_jitted(f_refine, rr.model, n=reps)

    f_step = jax.jit(lambda s, o: step(rig, cfg, s, o))
    st = init_track_state(k, jax.random.PRNGKey(4))
    times["full_step"] = time_jitted(f_step, st, o0, n=reps)

    return {
        "device": str(jax.devices()[0]),
        "k": k,
        "phases_ms": {n: round(t * 1e3, 3) for n, t in times.items()},
        "note": ("per-dispatch wall time; on the remote-TPU tunnel each "
                 "dispatch carries fixed RPC latency, so phase sums exceed "
                 "the scanned full-replay per-frame cost"),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/sosvo_tpu_cache")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    print(json.dumps(phase_breakdown(k=args.k), indent=2))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
