"""Real-capture ingestion (SURVEY.md C17): image files -> staging tool ->
.npz bundle -> CLI replay. The capture is synthesized by rendering frames and
writing them as PNGs, so the whole path an actual rig capture would take --
decode, square-crop, ground-truth association, frontend replay -- is covered
without a dataset."""

import json
import subprocess
import sys

import jax
import numpy as np
import pytest

IMG, F = 384, 6


@pytest.fixture(scope="module")
def capture_dir(tmp_path_factory):
    """A 'real capture': PNG frames + TUM ground truth on disk."""
    from PIL import Image

    from sosvo.data.sequence import save_tum_trajectory
    from sosvo.sensor.rig import default_rig
    from sosvo.synth.render import RoomScene, render_sequence
    from sosvo.synth.scene import make_trajectory

    d = tmp_path_factory.mktemp("capture")
    rig = default_rig(image_size=IMG)
    poses = make_trajectory(F, radius=0.4)
    room = RoomScene(radius=3.0, floor_z=-1.2, ceiling_z=1.6, texture_scale=2.0)
    imgs = np.asarray(jax.jit(lambda P: render_sequence(rig, P, room))(poses))
    for i, im in enumerate(imgs):
        Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)).save(
            d / f"frame_{i:04d}.png")
    save_tum_trajectory(d / "groundtruth.txt", np.asarray(poses))
    return d


def test_stage_and_replay(capture_dir, tmp_path):
    out_npz = tmp_path / "seq.npz"
    r = subprocess.run(
        [sys.executable, "scripts/stage_sequence.py", str(capture_dir),
         str(out_npz), "--gt", str(capture_dir / "groundtruth.txt"),
         "--size", str(IMG), "--sosq", str(tmp_path / "seq.sosq")],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]

    # Bundle sanity: frames round-trip through PNG quantization, GT attached.
    from sosvo.data.sequence import load_sequence
    seq = load_sequence(out_npz)
    assert seq.images.shape == (F, IMG, IMG)
    assert seq.poses is not None and seq.poses.shape == (F, 4, 4)

    # The .sosq stream decodes to the same frames via the native prefetcher.
    from sosvo.data.native_loader import SosqReader
    with SosqReader(tmp_path / "seq.sosq") as rd:
        assert len(rd) == F
        np.testing.assert_allclose(rd.get(0), seq.images[0], atol=1e-6)

    cfg = {
        "run": {"platform": "cpu"},
        "pipeline": {
            "frontend": {"max_features": 384, "pano_height": 96,
                         "pano_width": 768, "descriptor_patch": 16},
            "ransac": {"n_hyps": 256},
            "mode": "images",
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, "-m", "sosvo.cli", "--config", str(cfg_path),
         "--platform", "cpu", "--mode", "f2f", "--sequence", str(out_npz),
         "--out", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads((out / "report.json").read_text())
    assert rep["frames"] == F
    # PNG-quantized real-image path through the full frontend: the pipeline
    # must track (finite, small ATE vs the attached ground truth).
    assert rep["ate_rmse_m"] is not None and rep["ate_rmse_m"] < 0.1, rep
