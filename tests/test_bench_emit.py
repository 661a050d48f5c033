"""bench.py's printed-line budget (no Spark needed).

The driver records only the last ~2000 chars of bench stdout and
parses the JSON line out of that tail. BENCH_r03/r04 both came back
"parsed": null because the line outgrew the window once the registry
passed ~100 queries. emit_line must (a) keep the printed line inside
the budget, (b) preserve registry (sample-front) order among the kept
per-query entries, and (c) leave the full result on disk untouched.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _fake_out(n_queries: int) -> dict:
    return {
        "metric": "tier_pipeline_wall",
        "value": 12.345,
        "unit": "sec",
        "queries": {f"api_query_long_name_{i:03d}": 0.123 for i in range(n_queries)},
        "sf": 0.1,
        "cpus": 32,
        "points_per_sec": 1234567.8,
        "bytes_per_point": 4.796,
    }


def test_short_line_passes_through(tmp_path):
    out = _fake_out(5)
    line = bench.emit_line(dict(out), budget=1800, full_path=str(tmp_path / "f.json"))
    parsed = json.loads(line)
    assert parsed["queries"] == out["queries"]
    assert "queries_omitted" not in parsed


def test_long_line_trimmed_to_budget(tmp_path):
    out = _fake_out(130)  # mirrors the r4 registry size that broke parsing
    assert len(json.dumps(out)) > 1800
    line = bench.emit_line(dict(out), budget=1800, full_path=str(tmp_path / "f.json"))
    assert len(line) <= 1800
    parsed = json.loads(line)
    # headline fields survive intact
    assert parsed["value"] == 12.345
    assert parsed["points_per_sec"] == 1234567.8
    # trimming drops from the END of registry order: kept set is a
    # prefix, so the sample-front keys stay on the printed line
    kept = list(parsed["queries"])
    full = list(out["queries"])
    assert kept == full[: len(kept)]
    assert parsed["queries_omitted"] == len(full) - len(kept)
    assert parsed["queries_full"] == "BENCH/bench_full_latest.json"


def test_full_json_written_untrimmed(tmp_path):
    out = _fake_out(130)
    full_path = str(tmp_path / "bench_full.json")
    bench.emit_line(dict(out), budget=1800, full_path=full_path)
    with open(full_path) as f:
        full = json.load(f)
    assert full["queries"] == out["queries"]
    assert "queries_omitted" not in full
