"""Structured per-frame JSONL logging (SURVEY.md section 5.5).

The reference logs with prints + matplotlib [K]; here every replay emits one
JSON object per frame (counts, inlier ratio, pose, per-phase timings when
profiled) so runs are machine-comparable and feed the benchmark tables.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np


def stepoutput_rows(outs: Any, t_offset: int = 0) -> list[dict]:
    """Stacked StepOutput (leading frame axis) -> list of JSONL row dicts."""
    T = np.asarray(outs.T_world)
    rows = []
    for f in range(T.shape[0]):
        rows.append({
            "frame": int(f + t_offset),
            "pos": [round(float(x), 6) for x in T[f, :3, 3]],
            "n_stereo": int(np.asarray(outs.n_stereo)[f]),
            "n_temporal": int(np.asarray(outs.n_temporal)[f]),
            "n_inliers": int(np.asarray(outs.n_inliers)[f]),
            "pose_ok": bool(np.asarray(outs.pose_ok)[f]),
        })
    return rows


def write_jsonl(path: str | Path, rows: list[dict], append: bool = False) -> None:
    mode = "a" if append else "w"
    with open(path, mode) as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def read_jsonl(path: str | Path) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
