"""Performance-regression floor (SURVEY.md section 4.5; VERDICT r1 item 7).

Runs a small amortized c1-style replay and asserts a frames/s floor for the
current backend. Floors are deliberately loose (~3x below the measured rate
on each backend) so normal host jitter never trips them, while a real
regression -- an accidental f64 promotion, a lost fusion, a per-frame host
sync -- still does. Measured anchors (2026-08, jax 0.9.0):
  cpu (2-vCPU build host): 182 frames/s at K=256/H=256/8 frames
  tpu (v5e, amortized):    872 frames/s at K=512/H=512 (BASELINE.md c1)
"""

import statistics
import time

import jax
import jax.numpy as jnp

from sosvo.sensor.rig import default_rig
from sosvo.synth.scene import make_scene, observe_sequence
from sosvo.utils.config import FrontendConfig, PipelineConfig, RansacConfig
from sosvo.vo.pipeline import run_replay
from sosvo.vo.state import init_track_state

K, F = 256, 8
FLOORS = {"cpu": 60.0, "tpu": 200.0}


def test_replay_throughput_floor():
    rig = default_rig()
    cfg = PipelineConfig(frontend=FrontendConfig(max_features=K),
                         ransac=RansacConfig(n_hyps=256))
    scene = make_scene(jax.random.PRNGKey(0), n_frames=F, n_landmarks=4096)
    obs = observe_sequence(rig, scene, K, jax.random.PRNGKey(1),
                           pixel_noise=0.3, desc_flip_prob=0.02)
    st = init_track_state(K, jax.random.PRNGKey(2), T0=scene.poses[0])
    f = jax.jit(lambda s, o: run_replay(rig, cfg, s, o))
    _, outs = jax.block_until_ready(f(st, obs))  # warm-up / compile
    assert bool(jnp.all(outs.pose_ok[1:])), "replay must track before timing"

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(st, obs))
        ts.append(time.perf_counter() - t0)
    fps = F / statistics.median(ts)

    backend = jax.default_backend()
    floor = FLOORS.get(backend, FLOORS["cpu"])
    assert fps > floor, (
        f"replay throughput regressed: {fps:.1f} frames/s on {backend} "
        f"(floor {floor}); check for lost fusion / dtype promotion / host syncs")


def test_tpu_perf_gate_subprocess():
    """The RELATIVE chip-rate gate (VERDICT r2 weak #1/#3): bench.py vs the
    best recorded BENCH_r*.json driver artifact, plus per-phase budgets.

    The suite pins CPU (conftest), so this re-execs scripts/perf_gate.py in a
    fresh process on the default (TPU) backend. It is opt-in via
    SOSVO_TPU_GATE=1 -- a full TPU bench takes minutes and belongs in the
    once-per-round checklist (CLAUDE.md), not every CPU test run."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    if not os.environ.get("SOSVO_TPU_GATE"):
        import pytest

        pytest.skip("TPU gate is opt-in: SOSVO_TPU_GATE=1 python -m pytest "
                    "tests/test_perf_regression.py (or python scripts/perf_gate.py)")
    root = Path(__file__).resolve().parents[1]
    r = subprocess.run([sys.executable, str(root / "scripts/perf_gate.py")],
                       capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, f"perf gate FAILED:\n{r.stdout}\n{r.stderr[-2000:]}"
