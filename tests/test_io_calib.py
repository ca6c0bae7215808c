"""Round-trip tests: calibration JSON, sequence npz, TUM trajectories (C16/C17)."""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.data.sequence import (
    load_sequence,
    load_tum_trajectory,
    save_sequence,
    save_tum_trajectory,
)
from sosvo.sensor.calib_io import load_rig, save_rig
from sosvo.sensor.rig import default_rig
from sosvo.synth.scene import make_trajectory


def test_calib_json_roundtrip(tmp_path):
    rig = default_rig()
    p = tmp_path / "rig.json"
    save_rig(p, rig)
    rig2 = load_rig(p)
    for a, b in zip(jax.tree.leaves(rig), jax.tree.leaves(rig2)):
        assert np.allclose(np.asarray(a, np.float64), np.asarray(b, np.float64), atol=1e-6)


def test_sequence_npz_roundtrip(tmp_path):
    poses = np.asarray(make_trajectory(5))
    imgs = np.random.default_rng(0).random((5, 16, 16)).astype(np.float32)
    p = tmp_path / "seq.npz"
    save_sequence(p, images=imgs, poses=poses)
    seq = load_sequence(p)
    assert np.array_equal(seq.images, imgs)
    assert np.array_equal(seq.poses, poses)
    assert seq.timestamps.shape == (5,)


def test_tum_trajectory_roundtrip(tmp_path):
    poses = np.asarray(make_trajectory(7))
    p = tmp_path / "traj.tum"
    save_tum_trajectory(p, poses)
    ts, poses2 = load_tum_trajectory(p)
    assert poses2.shape == (7, 4, 4)
    assert np.max(np.abs(poses2 - poses)) < 1e-4
