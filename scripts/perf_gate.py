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
PHASES_ARTIFACT = ROOT / "PHASES.json"


def load_phase_budgets() -> tuple[dict, float]:
    """Per-phase budgets derived from the recorded PHASES.json artifact.

    Budgets = recorded amortized phase times x the artifact's headroom
    factor -- NOT hand-maintained constants (VERDICT r3 weak #6: constants
    rot silently; an artifact is re-recorded with `--record-phases` when a
    phase-shape change is intentional, and test_docs_sync-style staleness is
    visible in git history). A phase over budget names the suspect even when
    the total still squeaks past the ratio gate.
    """
    if not PHASES_ARTIFACT.exists():
        # Empty budgets silently reduce the gate to the total-rate check —
        # make the weakening loud (ADVICE r4).
        print("perf_gate: WARNING: PHASES.json missing — per-phase budget "
              "checks are DISABLED. Run `python scripts/perf_gate.py "
              "--record-phases` on the chip to restore them.",
              file=sys.stderr)
        return {}, 1.4
    rec = json.loads(PHASES_ARTIFACT.read_text())
    headroom = float(rec.get("headroom", 1.4))
    return {k: float(v) * headroom for k, v in rec["phases_ms"].items()}, headroom


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
    ap.add_argument("--record-phases", action="store_true",
                    help="rewrite PHASES.json from this run's measured "
                         "breakdown (use after an INTENTIONAL phase-shape "
                         "change, on the chip)")
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

        budgets, headroom = load_phase_budgets()
        phases = phase_breakdown(k=512)["phases_ms"]
        for name, ms in phases.items():
            budget = budgets.get(name)
            flag = ""
            if budget is not None and ms > budget:
                phase_fail.append(name)
                flag = f"  <-- OVER BUDGET ({budget:.3f} ms)"
            print(f"  {name:20s} {ms:8.4f} ms{flag}")
        if args.record_phases:
            import datetime

            PHASES_ARTIFACT.write_text(json.dumps({
                "phases_ms": {k: round(v, 4) for k, v in phases.items()},
                "headroom": headroom,
                "k": 512,
                "note": "recorded by scripts/perf_gate.py --record-phases",
                "date": datetime.date.today().isoformat(),
                "device": jax.devices()[0].device_kind + f", jax {jax.__version__}",
            }, indent=2) + "\n")
            print(f"perf_gate: recorded {PHASES_ARTIFACT}")
            phase_fail = []  # a fresh recording IS the new budget

    if not ok or phase_fail:
        if phase_fail:
            print(f"perf_gate: phases over budget: {', '.join(phase_fail)}",
                  file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
