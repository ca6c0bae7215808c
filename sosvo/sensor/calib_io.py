"""Calibration parameter IO: JSON <-> OmnistereoRig (SURVEY.md C16).

The reference fits GUM parameters with a chessboard toolchain and pickles the
model [K]; this framework CONSUMES calibrated parameters (full refit is a
documented v1 non-goal, SURVEY.md C16) through a plain-JSON schema, so a
reference-calibrated sensor can be ported by writing one small file. The
synthetic generator's exact rig round-trips through the same schema.

Schema:
{
  "image_height": 768, "image_width": 768, "baseline": 0.12,
  "top":    {"xi": ..., "fx": ..., "fy": ..., "cx": ..., "cy": ...,
             "min_elevation_deg": ..., "max_elevation_deg": ..., "z_offset": 0.0},
  "bottom": {...}
}
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from sosvo.sensor.model import ViewParams
from sosvo.sensor.rig import OmnistereoRig


def _view_to_dict(v: ViewParams) -> dict:
    return {
        "xi": float(v.xi),
        "fx": float(v.fx),
        "fy": float(v.fy),
        "cx": float(v.cx),
        "cy": float(v.cy),
        "min_elevation_deg": float(np.rad2deg(v.min_elevation)),
        "max_elevation_deg": float(np.rad2deg(v.max_elevation)),
        "z_offset": float(v.z_offset),
        # Full-GUM terms (SURVEY.md C3 / COMPAT.md #1); zero = clean model.
        "k1": float(v.k1), "k2": float(v.k2),
        "p1": float(v.p1), "p2": float(v.p2),
        "mis_rx": float(v.mis_rx), "mis_ry": float(v.mis_ry),
    }


def _view_from_dict(d: dict) -> ViewParams:
    return ViewParams.create(
        xi=d["xi"], fx=d["fx"], fy=d["fy"], cx=d["cx"], cy=d["cy"],
        min_elevation=np.deg2rad(d["min_elevation_deg"]),
        max_elevation=np.deg2rad(d["max_elevation_deg"]),
        z_offset=d.get("z_offset", 0.0),
        k1=d.get("k1", 0.0), k2=d.get("k2", 0.0),
        p1=d.get("p1", 0.0), p2=d.get("p2", 0.0),
        mis_rx=d.get("mis_rx", 0.0), mis_ry=d.get("mis_ry", 0.0),
    )


def save_rig(path: str | Path, rig: OmnistereoRig) -> None:
    d = {
        "image_height": int(rig.image_height),
        "image_width": int(rig.image_width),
        "baseline": float(rig.baseline),
        "top": _view_to_dict(rig.top),
        "bottom": _view_to_dict(rig.bottom),
    }
    Path(path).write_text(json.dumps(d, indent=2))


def load_rig(path: str | Path) -> OmnistereoRig:
    d = json.loads(Path(path).read_text())
    return OmnistereoRig(
        top=_view_from_dict(d["top"]),
        bottom=_view_from_dict(d["bottom"]),
        baseline=np.float32(d["baseline"]),
        image_height=int(d["image_height"]),
        image_width=int(d["image_width"]),
    )
