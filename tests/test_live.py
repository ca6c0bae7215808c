"""Live streaming VO: native .sosq frames -> eager jitted steps (C15 live mode)."""

import jax
import numpy as np
import pytest

from sosvo.data.native_loader import SosqReader, write_sosq, _build_lib
from sosvo.eval.ate import ate_rmse
from sosvo.sensor.rig import default_rig
from sosvo.synth.render import RoomScene, render_sequence
from sosvo.synth.scene import make_trajectory
from sosvo.utils.config import FrontendConfig, PipelineConfig, RansacConfig
from sosvo.vo.live import live_vo


def test_live_vo_over_native_stream(tmp_path):
    try:
        _build_lib()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native toolchain unavailable: {e}")

    rig = default_rig(image_size=768)
    n = 5
    poses = make_trajectory(n, radius=0.4)
    room = RoomScene(radius=3.0, floor_z=-1.2, ceiling_z=1.6, texture_scale=2.0)
    imgs = np.asarray(jax.jit(lambda P: render_sequence(rig, P, room))(poses))
    seq_path = tmp_path / "live.sosq"
    write_sosq(seq_path, imgs)

    cfg = PipelineConfig(
        frontend=FrontendConfig(max_features=384, pano_height=96, pano_width=768,
                                descriptor_patch=16),
        ransac=RansacConfig(rigid_angle_threshold=0.02, essential_threshold=0.01,
                            min_inliers=8),
    )

    results = {}
    with SosqReader(seq_path, readahead=2) as reader:
        frames = (reader.next() for _ in range(len(reader)))
        for idx, out in live_vo(rig, cfg, frames, key=jax.random.PRNGKey(1)):
            results[idx] = np.asarray(out.T_world)

    assert sorted(results) == list(range(n))
    # Live mode starts at identity; align and compare against ground truth.
    est = np.stack([results[i] for i in range(1, n)])
    gt = np.asarray(poses[1:])
    # Relative check: frame-to-frame translation magnitudes should match.
    d_est = np.linalg.norm(np.diff(est[:, :3, 3], axis=0), axis=-1)
    d_gt = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=-1)
    assert np.max(np.abs(d_est - d_gt)) < 0.01
