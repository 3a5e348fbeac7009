"""The driver-facing bench.py contract.

The round driver runs ``python bench.py`` and records the single JSON line
as ``BENCH_r{N}.json``; the judge reads it. Two things must never break:

1. the tracked ``bench_last.json`` record (the outage fallback the driver
   would replay) keeps the schema consumers rely on;
2. when the chip is unreachable, bench.py prints ONE parseable JSON line
   marked ``stale: true`` that replays that record — it must not hang, and
   must not print a fresh-looking number.

Both run in subprocesses (bench.py owns its own platform/probe logic); the
probe is bounded by BENCH_PROBE_TIMEOUT, so a dead tunnel cannot hang the
test.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_FPS = 1.0 / 0.066


def _load_last():
    with open(os.path.join(REPO, "bench_last.json")) as f:
        return json.load(f)


def test_bench_last_schema():
    rec = _load_last()
    for key in ("metric", "value", "unit", "vs_baseline", "mode",
                "exact_mode_fps", "serving_mode_fps", "passes_s",
                "measured_at"):
        assert key in rec, key
    assert rec["metric"] == "frames_per_sec_per_chip"
    assert rec["unit"] == "fps"
    # the record is a real measurement, self-consistent with the baseline
    assert rec["value"] > 0
    assert abs(rec["vs_baseline"] - rec["value"] / REFERENCE_FPS) < 0.01
    assert len(rec["passes_s"]) >= 3 and all(t > 0 for t in rec["passes_s"])


def test_unreachable_chip_replays_stale_record():
    env = dict(os.environ)
    env.pop("BENCH_SKIP_PROBE", None)
    # the probe subprocess inherits JAX_PLATFORMS=cpu from the test env and
    # rejects the CPU backend; if the plugin path hangs instead, the probe's
    # own timeout bounds it
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_PROBE_TIMEOUT"] = "60"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, timeout=240,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    assert proc.returncode == 0, proc.stderr.decode(errors="replace")[-500:]
    lines = [l for l in proc.stdout.decode().splitlines() if l.strip()]
    assert len(lines) == 1, lines  # ONE JSON line, nothing else on stdout
    rec = json.loads(lines[0])
    assert rec["stale"] is True
    assert "stale_reason" in rec
    # the replayed value is the tracked record's, not a fresh measurement
    assert rec["value"] == _load_last()["value"]
