"""The VO state machine: one jitted per-frame step, scanned over frames.

TPU-native replacement for the reference's per-frame driver loop (SURVEY.md
C15 and SS3.1): acquire -> stereo match -> triangulate -> temporal match ->
RANSAC pose -> refine -> concatenate. In the reference each stage crosses an
OpenCV/scipy native boundary per frame; here the ENTIRE body is one jitted
pure function over fixed-shape pytrees, so XLA fuses the whole frame and
`lax.scan` replays a sequence with zero host round-trips (BASELINE.json:5
"the whole frontend+backend JITs end-to-end").

This module implements the observation-mode pipeline (config c1,
BASELINE.json:7): inputs are per-frame feature observations (rays +
descriptors), exactly what the image frontend produces. The image-mode
pipeline composes the panorama/detect/describe frontend in front of the same
core (`sosvo/vo/image_pipeline.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sosvo.backend.refine import refine_pose_bearings
from sosvo.frontend.match import column_band_penalty, match
from sosvo.kernels.match_pallas import match_pallas
from sosvo.geom.lie import geodesic_angle, mat_inv
from sosvo.geometry.ransac import ransac_essential, ransac_rigid
from sosvo.geometry.triangulate import midpoint_triangulate
from sosvo.sensor.model import viewpoint
from sosvo.sensor.rig import OmnistereoRig
from sosvo.synth.scene import FrameObservations
from sosvo.utils.config import PipelineConfig
from sosvo.vo.keyframes import KeyframeFeatures
from sosvo.vo.state import StepOutput, TrackState


def azimuth_of(rays: jnp.ndarray) -> jnp.ndarray:
    return jnp.arctan2(rays[..., 1], rays[..., 0])


def _match(cfg: PipelineConfig, desc_a, desc_b, valid_a, valid_b,
           az_a=None, az_b=None, band: float = 0.0):
    """Matcher dispatch: fused Pallas kernel (TPU) or the XLA reference path.

    Identical semantics either way (tests/test_match_pallas.py); the band
    constraint is a dense penalty matrix in XLA and fused arithmetic in the
    kernel. The SIFT float-descriptor option (SURVEY.md C6) routes to the L2
    matcher -- the Pallas kernel is Hamming-specific, so it only applies to
    binary descriptors."""
    if cfg.frontend.descriptor == "sift":
        penalty = None
        if band > 0.0:
            penalty = column_band_penalty(az_a, az_b, band, wrap=2.0 * jnp.pi)
        return match(
            desc_a, desc_b, valid_a, valid_b,
            max_distance=cfg.frontend.match_max_distance_l2,
            ratio=cfg.frontend.match_ratio,
            penalty=penalty,
            metric="l2",
        )
    if cfg.frontend.use_pallas_match:
        return match_pallas(
            desc_a, desc_b, valid_a, valid_b,
            max_distance=cfg.frontend.match_max_distance,
            ratio=cfg.frontend.match_ratio,
            az_a=az_a, az_b=az_b, band=band,
            # Mosaic kernels need TPU hardware; elsewhere (CPU tests/debug)
            # fall back to the Pallas interpreter -- same semantics, slow.
            interpret=jax.default_backend() != "tpu",
        )
    penalty = None
    if band > 0.0:
        penalty = column_band_penalty(az_a, az_b, band, wrap=2.0 * jnp.pi)
    return match(
        desc_a, desc_b, valid_a, valid_b,
        max_distance=cfg.frontend.match_max_distance,
        ratio=cfg.frontend.match_ratio,
        penalty=penalty,
    )


def stereo_triangulate(rig: OmnistereoRig, obs: FrameObservations, cfg: PipelineConfig):
    """Stereo match top vs bottom feature sets, triangulate matched pairs.

    Returns fixed-size (K,) arrays indexed by TOP feature slot: 3D point,
    descriptor, ray, azimuth, validity.
    """
    az_t = azimuth_of(obs.ray_top)
    az_b = azimuth_of(obs.ray_bottom)
    # Coaxial views: epipolar curves are iso-azimuth (SURVEY.md C5/C7 [P1]),
    # so stereo candidates must agree in azimuth (wrapped band).
    m = _match(
        cfg, obs.desc_top, obs.desc_bottom, obs.valid_top, obs.valid_bottom,
        az_a=az_t, az_b=az_b, band=cfg.frontend.stereo_band_rad,
    )
    ray_b = obs.ray_bottom[m.idx_b]
    tri = midpoint_triangulate(
        obs.ray_top, ray_b,
        viewpoint(rig.top), viewpoint(rig.bottom),
        min_angle=cfg.min_triangulation_angle,
        max_range=cfg.max_range,
        max_gap=cfg.max_ray_gap,
    )
    valid = m.valid & tri.valid
    return tri.points, obs.desc_top, obs.ray_top, az_t, valid, ray_b


def step_full(
    rig: OmnistereoRig,
    cfg: PipelineConfig,
    state: TrackState,
    obs: FrameObservations,
) -> tuple[TrackState, StepOutput, "KeyframeFeatures"]:
    """One VO frame; also returns the frame's triangulated features so the
    keyframe/BA layer (`sosvo/vo/keyframes.py`) can consume them without
    recomputing the frontend."""
    key, k_ransac, k_ess = jax.random.split(state.key, 3)

    # --- stereo + triangulation (SURVEY.md SS3.2) ---
    pts, desc, rays, az, valid, ray_b = stereo_triangulate(rig, obs, cfg)
    n_stereo = jnp.sum(valid.astype(jnp.int32))

    # --- temporal match: previous frame's points vs current features ---
    tm = _match(cfg, state.prev_desc, desc, state.prev_valid, valid)
    pts_curr_m = pts[tm.idx_b]
    rays_curr_m = rays[tm.idx_b]
    pair_valid = tm.valid & state.prev_valid & valid[tm.idx_b]
    n_temporal = jnp.sum(pair_valid.astype(jnp.int32))

    # --- robust relative pose: T_cp (current-from-previous), 3D-3D (SS3.3) ---
    rr = ransac_rigid(
        k_ransac, state.prev_points, pts_curr_m, pair_valid,
        rays_curr=rays_curr_m,
        n_hyps=cfg.ransac.n_hyps,
        threshold=cfg.ransac.rigid_threshold,
        angle_threshold=cfg.ransac.rigid_angle_threshold,
        min_inliers=cfg.ransac.min_inliers,
    )

    # --- bearing-only refinement on inliers (SURVEY.md C12) ---
    w = rr.inliers.astype(jnp.float32)
    T_cp = refine_pose_bearings(rr.model, state.prev_points, rays_curr_m, w, iters=cfg.refine_iters)

    # --- essential-matrix gate (2D-2D path, SURVEY.md C9; config c1) ---
    if cfg.use_essential_gate:

        def run_gate(_):
            re, R_e, _t = ransac_essential(
                k_ess, state.prev_rays, rays_curr_m, pair_valid,
                n_hyps=cfg.ransac.n_hyps,
                threshold=cfg.ransac.essential_threshold,
                min_inliers=cfg.ransac.min_inliers,
            )
            angle = geodesic_angle(T_cp[:3, :3], R_e)
            return jnp.where(re.ok, angle < 0.15, True), angle

        if cfg.lazy_essential_gate:
            # Adaptive skip: a confidently-tracked frame (high rigid inlier
            # fraction) does not pay for the 2D-2D cross-check -- ~0.45 ms
            # of a ~1 ms frame. lax.cond executes ONE branch at runtime in
            # the replay scan (under vmap it lowers to select and both run,
            # which is correct, just not faster). The failure the gate
            # exists to catch -- a rigid pose biased by triangulation-depth
            # noise -- drops the inlier fraction first, so questionable
            # frames still run the full gate (threshold swept in
            # tests/test_pipeline_c1.py::test_lazy_gate_*).
            frac = rr.num_inliers.astype(jnp.float32) / jnp.maximum(
                n_temporal.astype(jnp.float32), 1.0)
            need = (frac < cfg.lazy_gate_ratio) | ~rr.ok
            ess_consistent, ess_angle = jax.lax.cond(
                need, run_gate,
                lambda _: (jnp.asarray(True), jnp.float32(0.0)),
                operand=None)
        else:
            ess_consistent, ess_angle = run_gate(None)
    else:
        ess_angle = jnp.float32(0.0)
        ess_consistent = jnp.asarray(True)

    pose_ok = rr.ok & ess_consistent
    # On failure hold the pose (identity relative motion) rather than
    # propagating a garbage estimate -- same recovery the reference's
    # frame-to-frame loop uses on tracking loss.
    T_cp = jnp.where(pose_ok, T_cp, jnp.eye(4, dtype=T_cp.dtype))
    T_world = state.T_world @ mat_inv(T_cp)

    new_state = TrackState(
        T_world=T_world,
        prev_points=pts,
        prev_desc=desc,
        prev_rays=rays,
        prev_azimuth=az,
        prev_valid=valid,
        frame_idx=state.frame_idx + 1,
        key=key,
    )
    out = StepOutput(
        T_world=T_world,
        n_stereo=n_stereo,
        n_temporal=n_temporal,
        n_inliers=rr.num_inliers,
        pose_ok=pose_ok,
        ess_angle_err=ess_angle,
    )
    feats = KeyframeFeatures(pts_rig=pts, desc=desc, ray_top=rays,
                             ray_bottom=ray_b, valid=valid)
    return new_state, out, feats


def step(
    rig: OmnistereoRig,
    cfg: PipelineConfig,
    state: TrackState,
    obs: FrameObservations,
) -> tuple[TrackState, StepOutput]:
    """One VO frame: returns (new_state, output). Pure; jit/scan/vmap-safe."""
    new_state, out, _ = step_full(rig, cfg, state, obs)
    return new_state, out


def run_replay(
    rig: OmnistereoRig,
    cfg: PipelineConfig,
    state: TrackState,
    obs_seq: FrameObservations,
) -> tuple[TrackState, StepOutput]:
    """Replay a whole sequence with lax.scan; outputs are stacked per frame."""

    def body(s, o):
        return step(rig, cfg, s, o)

    return jax.lax.scan(body, state, obs_seq)
