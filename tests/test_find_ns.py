"""find_ns accessory vs the reference findNs.py."""

from __future__ import annotations

import random
import subprocess
import sys


def _fasta(path, seqs):
    with open(path, "w") as f:
        for name, seq in seqs:
            f.write(f">{name} extra desc\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i:i + 60] + "\n")


def _run_both(tmp_path, min_len=None):
    args = [str(tmp_path / "in.fa"), "OUT"]
    if min_len is not None:
        args.append(str(min_len))
    r1 = subprocess.run(
        ["python3", "/root/reference/findNs.py", args[0],
         str(tmp_path / "ref.bed")] + args[2:],
        capture_output=True, text=True)
    r2 = subprocess.run(
        [sys.executable, "-m", "genrich_tpu.tools.find_ns", args[0],
         str(tmp_path / "new.bed")] + args[2:],
        capture_output=True, text=True, cwd="/root/repo")
    assert r1.returncode == r2.returncode
    assert (tmp_path / "ref.bed").read_text() == \
        (tmp_path / "new.bed").read_text()


def test_find_ns_matches_reference(tmp_path):
    rng = random.Random(7)
    seqs = []
    for i in range(4):
        parts = []
        for _ in range(30):
            parts.append("".join(rng.choice("ACGT") for _ in
                                 range(rng.randrange(10, 300))))
            parts.append("N" * rng.randrange(1, 300))
        seqs.append((f"chr{i}", "".join(parts)))
    # trailing-N quirk and leading Ns
    seqs.append(("chrN", "N" * 250 + "ACGT" * 50 + "N" * 150))
    seqs.append(("chrAllN", "N" * 500))
    _fasta(tmp_path / "in.fa", seqs)
    _run_both(tmp_path)
    _run_both(tmp_path, min_len=20)
