#!/usr/bin/env python
"""TPU performance gate: fail if the chip rate regresses vs the best artifact.

Round-2 lesson (VERDICT r2 weak #1/#3): a fixed loose floor cannot catch a
34% regression, and a gate that never runs on the chip is decoration. This
gate is RELATIVE and runs ON the deployment backend:

  1. `python bench.py` (the driver's exact protocol) -> current frames/s.
  2. Reference = max over all recorded BENCH_r*.json driver artifacts.
  3. FAIL unless current >= RATIO x reference (default 0.8).
  4. Per-phase budgets (sosvo.utils.phases amortized breakdown) so a failure
     NAMES the regressed stage instead of just the total.

Run once per round on the TPU (documented in CLAUDE.md):

    python scripts/perf_gate.py            # exits non-zero on regression
    python scripts/perf_gate.py --skip-phases   # quick total-only check
"""

from __future__ import annotations

import argparse
import glob
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

RATIO = 0.8

# Amortized per-phase budgets (ms) on TPU v5e at K=512/H=512 -- r3 measured
# values (BASELINE.md post-mortem: stereo 0.027, temporal 0.027, tri 0.026,
# rigid 0.288, refine 0.311, essential 0.454, full 1.004) x ~1.4 headroom.
# A phase over budget names the suspect even when the total still squeaks
# past the ratio gate.
PHASE_BUDGETS_MS = {
    "stereo_match": 0.04,
    "temporal_match": 0.04,
    "triangulate": 0.04,
    "ransac_rigid": 0.41,
    "refine": 0.44,
    "ransac_essential": 0.64,
    "full_step": 1.40,
}


def best_recorded() -> float:
    vals = []
    for p in glob.glob(str(ROOT / "BENCH_r*.json")):
        try:
            rec = json.loads(Path(p).read_text())
            vals.append(float(rec["parsed"]["value"]))
        except Exception:
            pass
    # The builder-recorded artifact counts too: the gate must hold the line
    # at the best rate EVER measured, not just the driver's end-of-round one.
    lp = ROOT / "BENCH_local.json"
    if lp.exists():
        try:
            vals.append(float(json.loads(lp.read_text())["value"]))
        except Exception:
            pass
    return max(vals) if vals else 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratio", type=float, default=RATIO)
    ap.add_argument("--skip-phases", action="store_true")
    args = ap.parse_args()

    ref = best_recorded()
    out = subprocess.run([sys.executable, str(ROOT / "bench.py")],
                         capture_output=True, text=True, cwd=ROOT)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not line:
        print(f"perf_gate: bench.py failed\n{out.stderr[-2000:]}", file=sys.stderr)
        return 2
    cur = float(json.loads(line[-1])["value"])
    floor = args.ratio * ref
    ok = cur >= floor or ref == 0.0
    print(f"perf_gate: {cur:.1f} frames/s vs best recorded {ref:.1f} "
          f"(floor {floor:.1f}) -> {'OK' if ok else 'REGRESSED'}")

    phase_fail = []
    if not args.skip_phases:
        import jax
        jax.config.update("jax_compilation_cache_dir", "/tmp/sosvo_tpu_cache")
        from sosvo.utils.phases import phase_breakdown

        phases = phase_breakdown(k=512)["phases_ms"]
        for name, ms in phases.items():
            budget = PHASE_BUDGETS_MS.get(name)
            flag = ""
            if budget is not None and ms > budget:
                phase_fail.append(name)
                flag = f"  <-- OVER BUDGET ({budget} ms)"
            print(f"  {name:20s} {ms:8.4f} ms{flag}")

    if not ok or phase_fail:
        if phase_fail:
            print(f"perf_gate: phases over budget: {', '.join(phase_fail)}",
                  file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
