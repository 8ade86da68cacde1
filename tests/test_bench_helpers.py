"""bench.py helper pins — no Spark needed. The stdout bench line is
parsed by the driver (last-2000-chars capture) and read by the judge,
so its shape and budget are contracts, as is the /proc/stat noise
annotation's degrade-to-empty behavior on hosts without the counters."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import _cpu_pcts, _cpu_sample, _fit_line


def test_cpu_pcts_computes_window_shares():
    # user nice system idle iowait irq softirq steal
    a = [100, 0, 50, 800, 10, 0, 0, 40]
    b = [200, 0, 100, 1500, 20, 0, 0, 80]
    out = _cpu_pcts(a, b)
    total = sum(x - y for x, y in zip(b, a))
    assert out["steal_pct"] == round(100.0 * 40 / total, 1)
    assert out["idle_pct"] == round(100.0 * 710 / total, 1)


def test_cpu_pcts_degrades_to_empty():
    assert _cpu_pcts(None, [1] * 8) == {}
    assert _cpu_pcts([1] * 8, [1] * 8) == {}  # zero-width window
    assert _cpu_pcts([1, 2], [3, 4]) == {}    # truncated counter line


def test_cpu_sample_reads_this_host():
    s = _cpu_sample()
    assert s is None or (len(s) >= 4 and all(isinstance(x, int) for x in s))


def test_fit_line_budget_and_dedicated_shape():
    timings = {f"q{i:03d}": 1.0 + i * 0.01 for i in range(183)}
    ded = {
        f"q{i:03d}": {
            "best": 5.0,
            "runs": [5.111, 5.222, 5.333],
            "steal_pct": [0.1, 0.2, 0.3],
            "idle_pct": [10.0, 11.0, 12.0],
        }
        for i in range(5)
    }
    line = _fit_line(sum(timings.values()), 0.1, timings, ded)
    assert len(line) <= 1900
    rec = json.loads(line)
    assert rec["queries_omitted"] + len(rec["queries"]) == len(timings)
    # the dedicated re-times always fit, with per-run noise annotation
    for v in rec["dedicated"].values():
        assert v["runs"] == [5.11, 5.22, 5.33]
        assert v["steal_pct"] == [0.1, 0.2, 0.3]
        assert v["idle_pct"] == [10.0, 11.0, 12.0]
