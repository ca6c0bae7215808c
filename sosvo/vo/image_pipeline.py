"""Image-mode VO: raw omni images -> frontend -> the same core step.

Benchmark config c2 (BASELINE.json:8: full frontend detect+match). The
reference's per-frame driver crosses OpenCV C++ boundaries for remap/detect/
describe/match every frame (SURVEY.md section 3.1); here the frontend
(`sosvo/frontend/image_frontend.py`) composes with the observation-mode core
step into ONE jitted function, so a full image-mode frame -- panorama warp,
Harris, BRIEF, stereo+temporal Hamming matching, triangulation, RANSAC,
refine -- is a single XLA program, scanned over frames in replay.
"""

from __future__ import annotations

import jax

from sosvo.frontend.image_frontend import FrontendLUTs, build_frontend_luts, extract_observations
from sosvo.sensor.rig import OmnistereoRig
from sosvo.utils.config import PipelineConfig
from sosvo.vo.pipeline import step
from sosvo.vo.state import StepOutput, TrackState


def image_step(
    rig: OmnistereoRig,
    luts: FrontendLUTs,
    cfg: PipelineConfig,
    state: TrackState,
    image: jax.Array,
) -> tuple[TrackState, StepOutput]:
    """One VO frame from a raw omnidirectional image. Pure; jit/scan-safe."""
    obs = extract_observations(rig, luts, cfg.frontend, image)
    return step(rig, cfg, state, obs)


def run_replay_images(
    rig: OmnistereoRig,
    cfg: PipelineConfig,
    state: TrackState,
    images: jax.Array,
    luts: FrontendLUTs | None = None,
) -> tuple[TrackState, StepOutput]:
    """Replay a raw-image sequence with lax.scan (stacked per-frame outputs)."""
    if luts is None:
        luts = build_frontend_luts(rig, cfg.frontend)

    def body(s, img):
        return image_step(rig, luts, cfg, s, img)

    return jax.lax.scan(body, state, images)
