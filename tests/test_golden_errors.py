"""Error-path goldens: malformed inputs through both ingest backends.

Every case runs the reference binary and our CLI (native and python
ingests) and compares stderr + exit codes.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
import oracle  # noqa: E402


def _hdr(chrom="chr1", ln=100000):
    return f"@HD\tVN:1.6\tSO:queryname\n@SQ\tSN:{chrom}\tLN:{ln}\n"


def _rec(qname="r1", flag=0, rname="chr1", pos=100, mapq=60,
         cigar="50M", rnext="*", pnext=0, tlen=0, seq=None, qual=None,
         extra=""):
    seq = seq if seq is not None else "A" * 50
    qual = qual if qual is not None else "I" * len(seq) \
        if seq != "*" else "*"
    f = [qname, str(flag), rname, str(pos + 1), str(mapq), cigar,
         rnext, str(pnext + 1), str(tlen), seq, qual]
    return "\t".join(f) + (("\t" + extra) if extra else "") + "\n"


def _check(tmp_path, text, case):
    sam = tmp_path / f"{case}.sam"
    sam.write_text(text)
    args = ["-t", str(sam), "-o", "out.np", "-y"]
    r_ref = oracle.run_oracle(args, cwd=str(tmp_path))
    for backend in ("native", "python"):
        r = oracle.run_ours(args + ["--ingest", backend],
                            cwd=str(tmp_path))
        assert r.returncode == r_ref.returncode, (
            case, backend, r_ref.stderr[-200:], r.stderr[-800:])
        if r_ref.returncode:
            # same final error line
            assert r.stderr.splitlines()[-1] == \
                r_ref.stderr.splitlines()[-1], (case, backend,
                                                r.stderr[-500:])


def test_header_after_records(tmp_path):
    _check(tmp_path, _hdr() + _rec() + "@CO\tlate header\n", "head")


def test_unknown_chrom(tmp_path):
    _check(tmp_path, _hdr() + _rec(rname="chrX"), "chrom")


def test_seq_cigar_mismatch(tmp_path):
    _check(tmp_path, _hdr() + _rec(cigar="49M"), "mism")


def test_no_seq_info(tmp_path):
    _check(tmp_path, _hdr() + _rec(seq="*", cigar="*", qual="*"),
           "info")


def test_linear_template(tmp_path):
    _check(tmp_path, _hdr() + _rec(flag=0x1 | 0x40 | 0x80), "linear")


def test_missing_pair_index(tmp_path):
    _check(tmp_path, _hdr() + _rec(flag=0x1), "index")


def test_read_beyond_ref_end(tmp_path):
    _check(tmp_path, _hdr(ln=120) + _rec(pos=130), "pos")


def test_chrom_length_mismatch(tmp_path):
    a = tmp_path / "a.sam"
    b = tmp_path / "b.sam"
    a.write_text(_hdr(ln=100000) + _rec())
    b.write_text(_hdr(ln=90000) + _rec())
    args = ["-t", f"{a},{b}", "-o", "out.np", "-y"]
    r_ref = oracle.run_oracle(args, cwd=str(tmp_path))
    for backend in ("native", "python"):
        r = oracle.run_ours(args + ["--ingest", backend],
                            cwd=str(tmp_path))
        assert r.returncode == r_ref.returncode == 1
        assert r.stderr.splitlines()[-1] == \
            r_ref.stderr.splitlines()[-1], backend


def test_truncated_fields(tmp_path):
    _check(tmp_path, _hdr() + "r1\t0\tchr1\t101\t60\t50M\n", "trunc")


def test_all_cigar_ops(tmp_path):
    # exercises M/I/D/N/S/H/P/=/X arithmetic (valid record)
    seq = "A" * 52
    text = _hdr() + _rec(cigar="5H10M2I5D3N20M1P10=10X5S",
                         seq=seq, qual="I" * len(seq))
    sam = tmp_path / "cigar.sam"
    sam.write_text(text)
    args = ["-t", str(sam), "-o", "out.np", "-y", "-b", "out.bed",
            "-p", "0.9", "-a", "0"]
    d1 = tmp_path / "r"
    d2 = tmp_path / "n"
    d1.mkdir()
    d2.mkdir()
    r_ref = oracle.run_oracle(args, cwd=str(d1))
    r_new = oracle.run_ours(args, cwd=str(d2))
    assert r_ref.returncode == r_new.returncode, (r_ref.stderr,
                                                  r_new.stderr[-800:])
    assert (d1 / "out.bed").read_bytes() == \
        (d2 / "out.bed").read_bytes()


def test_bam_bad_aux_type(tmp_path):
    sam = tmp_path / "in.sam"
    sam.write_text(_hdr() + _rec(extra="AS:f:1.5"))
    bam = str(tmp_path / "in.bam")
    # build BAM with a float AS (reference rejects type 'f' for AS)
    import struct, gzip
    out = bytearray()
    out += b"BAM\x01"
    text = _hdr().encode()
    out += struct.pack("<i", len(text)) + text
    out += struct.pack("<i", 1)
    out += struct.pack("<i", 5) + b"chr1\x00" + struct.pack("<i",
                                                            100000)
    name = b"r1\x00"
    body = struct.pack("<iiIIiiii", 0, 100,
                       (4680 << 16) | (60 << 8) | len(name),
                       (0 << 16) | 1, 4, -1, -1, 0)
    body += name + struct.pack("<I", (4 << 4) | 0)
    body += bytes([0x11, 0x11]) + bytes([30] * 4)
    body += b"ASf" + struct.pack("<f", 1.5)
    out += struct.pack("<i", len(body)) + body
    with open(bam, "wb") as f:
        f.write(gzip.compress(bytes(out)))
    args = ["-t", bam, "-o", "out.np", "-y"]
    r_ref = oracle.run_oracle(args, cwd=str(tmp_path))
    for backend in ("native", "python"):
        r = oracle.run_ours(args + ["--ingest", backend],
                            cwd=str(tmp_path))
        assert r.returncode == r_ref.returncode == 1, (backend,
                                                       r.stderr[-500:])
        assert r.stderr.splitlines()[-1] == \
            r_ref.stderr.splitlines()[-1], (backend, r.stderr[-300:])
