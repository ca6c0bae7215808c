"""Visualization artifacts (SURVEY.md C19): PLY export, 3D map plot, overlays.

The reference ships omni-image keypoint/match viewers and a point-cloud +
trajectory 3D view; these tests pin their equivalents down to concrete files
so the CLI `--viz` path can't silently rot.
"""

import json

import numpy as np

from sosvo.eval.viz import keypoint_overlay, match_overlay, plot_map_3d, save_ply


def test_save_ply_masked_roundtrip(tmp_path):
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    valid = np.array([True, False] * 5)
    n = save_ply(tmp_path / "m.ply", pts, valid=valid)
    assert n == 5
    lines = (tmp_path / "m.ply").read_text().splitlines()
    assert lines[0] == "ply"
    assert "element vertex 5" in lines
    body = lines[lines.index("end_header") + 1:]
    assert len(body) == 5
    # first surviving vertex is row 0 of the masked points
    assert [float(v) for v in body[0].split()] == [0.0, 1.0, 2.0]


def test_save_ply_colors(tmp_path):
    pts = np.zeros((4, 3), np.float32)
    cols = np.array([[1.0, 0.0, 0.5]] * 4)
    save_ply(tmp_path / "c.ply", pts, colors=cols)
    txt = (tmp_path / "c.ply").read_text()
    assert "property uchar red" in txt
    assert txt.splitlines()[-1].split()[3:] == ["255", "0", "127"]


def test_plot_and_overlays_write_files(tmp_path):
    rng = np.random.default_rng(0)
    T = np.tile(np.eye(4, dtype=np.float32), (6, 1, 1))
    T[:, 0, 3] = np.linspace(0, 1, 6)
    lm = rng.normal(size=(50, 3)).astype(np.float32)
    plot_map_3d(tmp_path / "map3d.png", T, lm, np.ones(50, bool), traj_gt=T)

    img = rng.uniform(size=(64, 64)).astype(np.float32)
    uv = rng.uniform(4, 60, size=(20, 2)).astype(np.float32)
    ok = rng.uniform(size=20) > 0.3
    keypoint_overlay(tmp_path / "kp.png", img, uv, ok, uv + 2.0, ok)
    match_overlay(tmp_path / "mt.png", img, uv, uv + 3.0, ok)
    for f in ("map3d.png", "kp.png", "mt.png"):
        assert (tmp_path / f).stat().st_size > 1000


def test_cli_viz_ba_mode(tmp_path):
    """End-to-end: --viz in ba mode writes trajectory + 3D map + PLY."""
    from sosvo.cli import main

    cfg = {
        "run": {"n_frames": 6, "n_landmarks": 1024, "pixel_noise": 0.0,
                "desc_flip_prob": 0.0},
        "pipeline": {"frontend": {"max_features": 128},
                     "ransac": {"n_hyps": 64, "min_inliers": 8},
                     "ba": {"window": 3, "max_landmarks": 256},
                     "mode": "observations"},
    }
    cfg_path = tmp_path / "viz_cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out = tmp_path / "run"
    rc = main(["--config", str(cfg_path), "--out", str(out), "--mode", "ba",
               "--viz", "--platform", "cpu"])
    assert rc == 0
    for f in ("trajectory.png", "map_3d.png", "map.ply"):
        assert (out / f).stat().st_size > 200, f
    header = (out / "map.ply").read_text().splitlines()[:3]
    assert header[0] == "ply" and header[2].startswith("element vertex")


def test_html_viewer_export(tmp_path):
    """Interactive single-file viewer (SURVEY.md C19): embeds the data, needs
    no network, and renders both trajectories + the landmark cloud."""
    import json
    import re

    import numpy as np

    from sosvo.eval.html_viewer import export_html_viewer

    F, L = 12, 50
    traj = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    traj[:, 0, 3] = np.linspace(0, 1, F)
    gt = traj.copy()
    gt[:, 1, 3] = 0.01
    lm = np.random.RandomState(0).randn(L, 3).astype(np.float32)
    valid = np.ones((L,), bool)
    valid[::5] = False

    p = export_html_viewer(tmp_path / "v.html", traj, traj_gt=gt,
                           landmarks=lm, lm_valid=valid, ate=0.0123)
    text = p.read_text()
    assert text.startswith("<!DOCTYPE html>") and "</html>" in text
    assert "http://" not in text and "https://" not in text  # self-contained
    data = json.loads(re.search(r"const DATA = (\{.*?\});", text).group(1))
    assert len(data["traj"]) == F and len(data["gt"]) == F
    assert len(data["lm"]) == int(valid.sum())
    assert abs(data["ate"] - 0.0123) < 1e-9
