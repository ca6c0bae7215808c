"""Every shipped preset must load and be internally coherent -- presets are
the judge-runnable contract (BASELINE.json:7-11 -> configs/*.json)."""

import glob
import json
import os

from sosvo.utils.config import load_pipeline_config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_presets_load_and_cohere():
    paths = sorted(glob.glob(os.path.join(ROOT, "configs", "*.json")))
    assert len(paths) >= 6, paths
    for p in paths:
        cfg = load_pipeline_config(p)
        raw = json.load(open(p))
        # Landmark capacity divisible by any model-parallel request (the CLI
        # clamps at runtime, but a preset should not rely on the clamp).
        if cfg.dist.model_parallel > 1:
            assert cfg.ba.max_landmarks % cfg.dist.model_parallel == 0, p
        # Batched presets must declare a sequence count the mesh divides.
        if cfg.dist.data_parallel > 1:
            s = int(raw.get("run", {}).get("n_sequences", cfg.dist.data_parallel))
            assert s % cfg.dist.data_parallel == 0, p
        # Adaptive keyframing needs sane thresholds and gap ordering.
        if cfg.keyframe_mode == "adaptive":
            assert cfg.kf_min_gap >= 1 and cfg.kf_max_gap > cfg.kf_min_gap, p
            assert cfg.kf_trans_thresh > 0 and cfg.kf_rot_thresh > 0, p
        # PGO presets need loop gates configured.
        if cfg.pose_graph:
            assert cfg.loop_min_inliers > 0, p
        assert cfg.keyframe_mode in ("stride", "adaptive"), p
        assert cfg.frontend.descriptor in ("brief", "sift", "akaze"), p


def test_adaptive_preset_exercises_adaptive_pgo():
    cfg = load_pipeline_config(os.path.join(ROOT, "configs", "c3_adaptive.json"))
    assert cfg.keyframe_mode == "adaptive" and cfg.pose_graph
