"""Band building must not mix boards from different core counts.

Boards at 8 cores measure a different machine shape (and at sf0.1 they
BEAT the 32-core boards — fixed-overhead regime), so letting one into
the 32-core band would silently tighten band mins and produce false
regression flags. bench.py stamps ``cpus`` into every result as of
r16; entries without the stamp predate it and were all 32-core.
"""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import bench_band


def _write_hist(tmp_path, records):
    p = tmp_path / "hist.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in records) + "\n")
    return str(p)


def test_build_band_skips_foreign_core_counts(tmp_path, monkeypatch):
    records = [
        # legacy entry, no stamp -> treated as 32-core
        {"sf": 0.1, "queries": {"q1": 2.0}},
        # stamped 32-core entry
        {"sf": 0.1, "cpus": 32, "queries": {"q1": 1.8}},
        # 8-core board: faster, must NOT lower the band min
        {"sf": 0.1, "cpus": 8, "queries": {"q1": 0.5}},
        # wrong sf: ignored regardless of cpus
        {"sf": 0.01, "cpus": 32, "queries": {"q1": 0.1}},
    ]
    monkeypatch.setattr(bench_band, "HIST", _write_hist(tmp_path, records))
    band = bench_band.build_band(sf=0.1, n_boards=8)
    assert band["q1"]["min"] == 1.8
    assert band["q1"]["n"] == 2

    band8 = bench_band.build_band(sf=0.1, n_boards=8, cpus=8)
    assert band8["q1"]["min"] == 0.5
    assert band8["q1"]["n"] == 1
