"""Image frontend: raw omni image -> panoramas -> keypoints -> observations.

Composes the panorama warp (SURVEY.md C5), Harris detection (C6), BRIEF
description (C6) into the same fixed-size `FrameObservations` structure the
core VO pipeline consumes -- so observation-mode (c1) and image-mode (c2+)
share every downstream component. This whole function jits and fuses with the
per-frame step: the reference crosses three OpenCV C++ boundaries here per
frame (remap, detector, descriptor); we cross zero.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sosvo.frontend.descriptor import describe
from sosvo.frontend.detect import detect, gaussian_smooth
from sosvo.frontend.panorama import PanoGeometry, build_pano_geometry, pano_ray, warp_panorama
from sosvo.sensor.model import project
from sosvo.sensor.rig import OmnistereoRig
from sosvo.synth.scene import FrameObservations
from sosvo.utils.config import FrontendConfig


class FrontendLUTs(NamedTuple):
    """Per-view panorama geometries, built once per calibration."""

    top: PanoGeometry
    bottom: PanoGeometry


def build_frontend_luts(rig: OmnistereoRig, cfg: FrontendConfig) -> FrontendLUTs:
    # Use the stereo-overlap elevation band for BOTH panoramas so matching
    # stereo features see the same scene band (SURVEY.md C4).
    lo = float(jnp.maximum(rig.top.min_elevation, rig.bottom.min_elevation))
    hi = float(jnp.minimum(rig.top.max_elevation, rig.bottom.max_elevation))
    return FrontendLUTs(
        top=build_pano_geometry(rig.top, cfg.pano_height, cfg.pano_width, lo, hi,
                                image_height=rig.image_height,
                                image_width=rig.image_width),
        bottom=build_pano_geometry(rig.bottom, cfg.pano_height, cfg.pano_width, lo, hi,
                                   image_height=rig.image_height,
                                   image_width=rig.image_width),
    )


def extract_observations(
    rig: OmnistereoRig,
    luts: FrontendLUTs,
    cfg: FrontendConfig,
    image: jnp.ndarray,
) -> FrameObservations:
    """Full frontend for one raw omni image; fixed K slots per view."""
    k = cfg.max_features

    def run_view(view, geom: PanoGeometry):
        pano = warp_panorama(image, geom)
        smoothed = gaussian_smooth(pano)
        kps = detect(
            pano,
            k,
            threshold=cfg.detect_threshold * 1e-7,
            nms_radius=cfg.nms_grid,
            border_rows=cfg.descriptor_patch // 2 + 2,
        )
        desc = describe(pano, kps, smoothed=smoothed)
        rays = pano_ray(geom.height, geom.width, geom.min_elevation, geom.max_elevation,
                        kps.rows, kps.cols)
        uv, _ = project(view, rays)
        # Keypoints whose pano cell has no raw-image support are invalid.
        lut_ok = geom.valid[kps.rows.astype(jnp.int32), kps.cols.astype(jnp.int32)]
        return uv, rays, desc, kps.valid & lut_ok

    uv_t, ray_t, desc_t, ok_t = run_view(rig.top, luts.top)
    uv_b, ray_b, desc_b, ok_b = run_view(rig.bottom, luts.bottom)
    return FrameObservations(
        uv_top=uv_t,
        uv_bottom=uv_b,
        ray_top=ray_t,
        ray_bottom=ray_b,
        desc_top=desc_t,
        desc_bottom=desc_b,
        valid_top=ok_t,
        valid_bottom=ok_b,
        lm_id=jnp.full((k,), -1, jnp.int32),
    )
