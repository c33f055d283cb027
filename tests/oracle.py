"""Reference-binary oracle and synthetic SAM/BAM fixtures.

Compiles the reference Genrich (read-only at /root/reference) into the
gitignored .oracle/ directory and provides generators for
queryname-sorted synthetic alignment files used by the golden tests.
"""

from __future__ import annotations

import gzip
import os
import random
import struct
import subprocess
import zlib
from typing import List, Optional, Tuple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_DIR = os.path.join(REPO, ".oracle")
ORACLE_BIN = os.path.join(ORACLE_DIR, "Genrich")
REF_SRC = "/root/reference/Genrich.c"


def build_oracle() -> str:
    """Compile the reference binary once; return its path."""
    if os.path.exists(ORACLE_BIN) and (
            os.path.getmtime(ORACLE_BIN) >= os.path.getmtime(REF_SRC)):
        return ORACLE_BIN
    os.makedirs(ORACLE_DIR, exist_ok=True)
    subprocess.run(
        ["gcc", "-g", "-O2", "-std=gnu99", "-o", ORACLE_BIN, REF_SRC,
         "-lz", "-lm"],
        check=True, capture_output=True)
    return ORACLE_BIN


def run_oracle(args: List[str], cwd: str) -> subprocess.CompletedProcess:
    return subprocess.run([build_oracle()] + args, cwd=cwd,
                          capture_output=True, text=True)


def run_ours(args: List[str], cwd: str,
             env=None) -> subprocess.CompletedProcess:
    import sys
    return subprocess.run(
        [sys.executable, "-m", "genrich_tpu"] + args, cwd=cwd,
        capture_output=True, text=True,
        env={**os.environ, **(env or {}), "PYTHONPATH": REPO})


# --- synthetic data -------------------------------------------------

class SamBuilder:
    """Builds a queryname-sorted SAM file with paired/unpaired records."""

    def __init__(self, chroms: List[Tuple[str, int]], seed: int = 0):
        self.chroms = chroms
        self.rng = random.Random(seed)
        self.records: List[List[str]] = []  # grouped by template
        self._n = 0

    def header_lines(self) -> List[str]:
        lines = ["@HD\tVN:1.6\tSO:queryname"]
        for name, length in self.chroms:
            lines.append(f"@SQ\tSN:{name}\tLN:{length}")
        return lines

    def _qname(self) -> str:
        self._n += 1
        return f"read{self._n:06d}"

    def add_pair(self, chrom: str, pos1: int, pos2: int,
                 read_len: int = 50, score: Optional[int] = None,
                 mapq: int = 60, qual: str = None,
                 secondary: bool = False,
                 qname: Optional[str] = None) -> str:
        """Proper pair: R1 forward at pos1, R2 reverse ending pos2+len."""
        qname = qname or self._qname()
        seq = "A" * read_len
        qual = qual if qual is not None else "I" * read_len
        extra = [] if score is None else [f"AS:i:{score}"]
        f1 = 0x1 | 0x2 | 0x40 | 0x20 | (0x100 if secondary else 0)
        f2 = 0x1 | 0x2 | 0x80 | 0x10 | (0x100 if secondary else 0)
        r1 = [qname, str(f1), chrom, str(pos1 + 1), str(mapq),
              f"{read_len}M", "=", str(pos2 + 1), "0", seq, qual] + extra
        r2 = [qname, str(f2), chrom, str(pos2 + 1), str(mapq),
              f"{read_len}M", "=", str(pos1 + 1), "0", seq, qual] + extra
        self.records.append(["\t".join(r1), "\t".join(r2)])
        return qname

    def add_single(self, chrom: str, pos: int, read_len: int = 50,
                   reverse: bool = False, score: Optional[int] = None,
                   mapq: int = 60, first: bool = True,
                   paired_flags: bool = False,
                   qname: Optional[str] = None) -> str:
        """Unpaired alignment (or an unpaired half of a pair)."""
        qname = qname or self._qname()
        seq = "A" * read_len
        flag = (0x10 if reverse else 0)
        if paired_flags:
            flag |= 0x1 | (0x40 if first else 0x80) | 0x8
        extra = [] if score is None else [f"AS:i:{score}"]
        r = [qname, str(flag), chrom, str(pos + 1), str(mapq),
             f"{read_len}M", "*", "0", "0", seq, "I" * read_len] + extra
        self.records.append(["\t".join(r)])
        return qname

    def write(self, path: str) -> str:
        with open(path, "w") as f:
            for line in self.header_lines():
                f.write(line + "\n")
            for group in self.records:
                for rec in group:
                    f.write(rec + "\n")
        return path


def random_sam(path: str, chroms=(("chr1", 100000), ("chr2", 50000)),
               n_pairs: int = 300, n_singles: int = 50,
               seed: int = 42, read_len: int = 50,
               with_scores: bool = True,
               cluster: bool = True) -> str:
    """A reproducible SAM with clustered fragments (peak-like signal)."""
    b = SamBuilder(list(chroms), seed=seed)
    rng = b.rng
    hotspots = []
    for name, length in chroms:
        hotspots += [(name, length, rng.randrange(1000, length - 1000))
                     for _ in range(3)]
    for _ in range(n_pairs):
        name, length, hs = rng.choice(hotspots)
        if cluster and rng.random() < 0.7:
            p1 = max(0, hs + rng.randrange(-300, 300))
        else:
            p1 = rng.randrange(0, length - 600)
        frag = rng.randrange(read_len + 10, 400)
        p2 = min(p1 + frag - read_len, length - read_len - 1)
        score = rng.randrange(-20, 1) if with_scores else None
        b.add_pair(name, p1, p2, read_len=read_len, score=score)
    for _ in range(n_singles):
        name, length, hs = rng.choice(hotspots)
        pos = rng.randrange(0, length - read_len - 1)
        score = rng.randrange(-20, 1) if with_scores else None
        b.add_single(name, pos, read_len=read_len,
                     reverse=rng.random() < 0.5, score=score)
    return b.write(path)


BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def bgzf_compress(data: bytes, block: int = 65280) -> bytes:
    """BGZF-frame `data`: gzip members with the BC extra subfield and
    the fixed 28-byte EOF block (SAM spec §4.1; perf_synth.BgzfWriter
    is the streaming twin).  Real-world BAMs use this framing; the
    reference reads it through zlib's member-concatenating gzFile
    (Genrich.c:4983), our native ingest through the multithreaded
    BGZF ring decompressor (native/ingest.cpp)."""
    out = bytearray()
    for off in range(0, len(data), block):
        payload = data[off:off + block]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        comp = co.compress(payload) + co.flush()
        bsize = len(comp) + 25
        out += struct.pack("<BBBBIBBHBBHH",
                           0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6,
                           ord("B"), ord("C"), 2, bsize)
        out += comp
        out += struct.pack("<II", zlib.crc32(payload), len(payload))
    out += BGZF_EOF
    return bytes(out)


def sam_to_bam(sam_path: str, bam_path: str,
               framing: str = "gzip") -> str:
    """Convert our synthetic SAM into a BAM.

    framing="gzip": one plain gzip member (zlib-readable).
    framing="bgzf": real-world BGZF blocks (exercises the native
    multithreaded decompressor).
    """
    seq_code = {"=": 0, "A": 1, "C": 2, "M": 3, "G": 4, "R": 5, "S": 6,
                "V": 7, "T": 8, "W": 9, "Y": 10, "H": 11, "K": 12,
                "D": 13, "B": 14, "N": 15}
    op_code = {"M": 0, "I": 1, "D": 2, "N": 3, "S": 4, "H": 5, "P": 6,
               "=": 7, "X": 8}
    headers = []
    refs = []
    records = []
    with open(sam_path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("@"):
                headers.append(line)
                if line.startswith("@SQ"):
                    d = dict(x.split(":", 1) for x in line.split("\t")[1:])
                    refs.append((d["SN"], int(d["LN"])))
                continue
            records.append(line.split("\t"))
    ref_idx = {name: i for i, (name, _) in enumerate(refs)}

    out = bytearray()
    out += b"BAM\x01"
    text = ("\n".join(headers) + "\n").encode()
    out += struct.pack("<i", len(text)) + text
    out += struct.pack("<i", len(refs))
    for name, length in refs:
        nb = name.encode() + b"\x00"
        out += struct.pack("<i", len(nb)) + nb + struct.pack("<i", length)
    for f in records:
        qname, flag, rname, pos, mapq, cigar, rnext, pnext, tlen, \
            seq, qual = f[:11]
        extras = f[11:]
        name_b = qname.encode() + b"\x00"
        cig = []
        num = ""
        for ch in cigar:
            if ch.isdigit():
                num += ch
            else:
                cig.append((int(num) << 4) | op_code[ch])
                num = ""
        l_seq = 0 if seq == "*" else len(seq)
        packed = bytearray()
        for i in range(0, l_seq, 2):
            hi = seq_code.get(seq[i], 15) << 4
            lo = seq_code.get(seq[i + 1], 15) if i + 1 < l_seq else 0
            packed.append(hi | lo)
        qual_b = (b"\xff" * l_seq if qual == "*"
                  else bytes(ord(c) - 33 for c in qual))
        aux = b""
        for e in extras:
            tag, typ, val = e.split(":", 2)
            if typ == "i":
                aux += tag.encode() + b"i" + struct.pack("<i", int(val))
            elif typ == "Z":
                aux += tag.encode() + b"Z" + val.encode() + b"\x00"
        body = struct.pack(
            "<iiIIiiii",
            ref_idx[rname], int(pos) - 1,
            (4680 << 16) | (int(mapq) << 8) | len(name_b),
            (int(flag) << 16) | len(cig),
            l_seq,
            ref_idx.get(rnext if rnext != "=" else rname, -1),
            int(pnext) - 1, int(tlen))
        body += name_b
        body += b"".join(struct.pack("<I", c) for c in cig)
        body += bytes(packed) + qual_b + aux
        records_b = struct.pack("<i", len(body)) + body
        out += records_b
    raw = bytes(out)
    with open(bam_path, "wb") as fh:
        if framing == "bgzf":
            fh.write(bgzf_compress(raw))
        else:
            fh.write(gzip.compress(raw))
    return bam_path
