"""The end-to-end bench harness itself (scripts/bench_e2e.py).

Runs the reference-vs-exact comparison at toy scale so the artifact
generator that produces BENCH_r*.json's "e2e" key can't rot: synth ->
reference -> --engine exact -> byte-parity, all through the real
harness code path (jax leg excluded; it needs the device).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts"))


def test_bench_e2e_exact_leg(tmp_path, monkeypatch):
    monkeypatch.setenv("GENRICH_PERF_DIR", str(tmp_path))
    import bench_e2e
    chroms = (("chr1", 40_000_000), ("chr2", 25_000_000))
    out = bench_e2e.bench_e2e(20_000, include_jax=False, timeout=300,
                              chroms=chroms)
    assert out["exact_match"] is True
    assert out["records"] > 40_000
    assert out["ref_s"] > 0 and out["exact_s"] > 0
    assert (tmp_path / "atac_e2e_c65000000_20000.bam").exists()
