"""Peak-memory comparison at scale: reference vs --engine exact.

The reference's memory is O(genome): dense 3 B/bp diff arrays
(/root/reference/README.md:533 — 17.1 GB on its published 146M-record
run, 8.4 GB floor at hg19 scale) plus per-read dedup structures.  The
event-based engine is O(events).  This measures both as hard numbers
(ru_maxrss via wait4) on a 10M-pair (~24M-record) hg19-scale BGZF
BAM — the largest footprint leg VERDICT r2 asked for — and checks
byte-parity while at it.

Run:  python scripts/bench_mem.py [n_pairs]     (default 10M)
Emits one JSON line; intended for a committed MEMBENCH_r*.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_e2e import FLAGS, _bam_path, _oracle_bin, _run_rss  # noqa: E402


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    bam = _bam_path(n_pairs)
    ref = _oracle_bin()
    out = {"n_pairs": n_pairs, "flags": " ".join(FLAGS)}
    with tempfile.TemporaryDirectory() as d:
        t, rc, err, rss = _run_rss([ref, "-t", bam, "-o", "ref.np",
                                    "-v"] + FLAGS, d, 3600.0)
        assert rc == 0, (err or "")[-500:]
        out["ref_s"] = round(t, 2)
        out["ref_rss_mb"] = round(rss, 1)
        for line in err.splitlines():
            if "records analyzed" in line:
                out["records"] = int(line.split()[-1])
        t, rc, err, rss = _run_rss(
            [sys.executable, "-m", "genrich_tpu", "-t", bam, "-o",
             "exact.np", "--engine", "exact"] + FLAGS, d, 3600.0,
            extra_env={"PALLAS_AXON_POOL_IPS": ""})
        assert rc == 0, (err or "")[-500:]
        out["exact_s"] = round(t, 2)
        out["exact_rss_mb"] = round(rss, 1)
        out["exact_match"] = (
            open(os.path.join(d, "ref.np"), "rb").read()
            == open(os.path.join(d, "exact.np"), "rb").read())
        out["speedup"] = round(out["ref_s"] / out["exact_s"], 3)
        out["rss_ratio"] = round(out["ref_rss_mb"]
                                 / out["exact_rss_mb"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
