"""End-to-end benchmark: compiled reference vs our CLI on one BAM.

Synthesizes (and caches) a multi-million-record BGZF BAM with the
published workload's shape (SURVEY.md §6: ATAC, PCR duplicates,
multimappers, -r -j -q 0.05), then times

  - the compiled reference binary (tests/oracle.build_oracle),
  - ``--engine exact``  (native ingest + numpy; byte-parity checked),
  - ``--engine jax`` and ``--engine sharded`` through the persistent
    serve mode (``--serve``): one process, cold first analysis
    (includes XLA program compile/load — 25-100 s per program through
    a remote-compile relay), then warm repeats that reuse the loaded
    programs.  ``warm_s`` is the steady-state number a resident TPU
    deployment sees; ``load_s = cold_s - warm_s`` is the one-time
    cost.

Protocol: every subprocess leg runs ``reps`` times (default 3) and
reports the median plus the spread (max-min)/median; peak RSS is
captured via wait4/ru_maxrss for the reference and exact legs (the
reference holds dense 3 B/bp diff arrays — README.md:533 — ours is
O(events)).

Prints a JSON dict; bench.py embeds it in its single-line output as
the "e2e" key.  The reference's only published number is 146M records
in 10.5 min single-core (README.md:459-511, ~232K records/s); this
measures the actual ratio on the same machine instead of trusting
that anchor.
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_DIR = os.environ.get("GENRICH_PERF_DIR", "/tmp/genrich_perf")
FLAGS = ["-r", "-j", "-q", "0.05", "-a", "20"]

# hg19-scale genome (2.75 Gbp over 3 chroms): the regime of the
# reference's sole published benchmark (README.md:459-511, 2.83 Gbp).
# Genome length is a first-class cost axis — the reference's dense
# 3 B/bp diff arrays and per-base sweeps are O(genome), our
# event-based engine O(events) — so benching on a toy genome would
# hide most of the honest difference.
HG_CHROMS = (("chr1", 1_100_000_000), ("chr2", 900_000_000),
             ("chr3", 750_000_000))


def _bam_path(n_pairs: int, chroms=None) -> str:
    cache = os.environ.get("GENRICH_PERF_DIR", CACHE_DIR)
    os.makedirs(cache, exist_ok=True)
    tag = "hg" if chroms is None else "c%d" % sum(
        l for _, l in chroms)
    chroms = HG_CHROMS if chroms is None else chroms
    path = os.path.join(cache, f"atac_e2e_{tag}_{n_pairs}.bam")
    if not os.path.exists(path):
        sys.stderr.write(f"# synthesizing {n_pairs}-pair BAM...\n")
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        import perf_synth
        perf_synth.synth_bam(path, n_pairs, chroms=chroms)
    return path


def _oracle_bin() -> str:
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import oracle
    return oracle.build_oracle()


def _env(extra=None) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if extra:
        env.update(extra)
    return env


def _run_rss(cmd, cwd, timeout, extra_env=None):
    """One run: (wall_s, rc, stderr_text, peak_rss_mb).

    Reads stderr to EOF itself and reaps with os.wait4 for rusage
    (ru_maxrss, KiB on Linux) — Popen.communicate() would reap the
    child first and lose the rusage.  A watchdog kills on timeout.
    """
    import threading
    proc = subprocess.Popen(cmd, cwd=cwd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.PIPE, text=True,
                            env=_env(extra_env))
    t0 = time.perf_counter()
    timed_out = []
    watchdog = threading.Timer(timeout, lambda: (
        timed_out.append(1), proc.kill()))
    watchdog.start()
    try:
        err = proc.stderr.read()
    finally:
        watchdog.cancel()
    _, status, ru = os.wait4(proc.pid, 0)
    proc.returncode = os.waitstatus_to_exitcode(status)
    if timed_out:
        return time.perf_counter() - t0, None, "timeout", 0.0
    return (time.perf_counter() - t0, proc.returncode, err,
            ru.ru_maxrss / 1024.0)


def _timed_leg(cmd, cwd, timeout, reps, extra_env=None):
    """reps runs -> dict(median_s, rep_s, spread_pct, rss_mb)."""
    times, rss = [], 0.0
    err = ""
    for _ in range(reps):
        t, rc, err, r = _run_rss(cmd, cwd, timeout, extra_env)
        assert rc == 0, (cmd[0], (err or "")[-500:])
        times.append(t)
        rss = max(rss, r)
    ts = sorted(times)
    med = ts[len(ts) // 2]
    return {"median_s": round(med, 2),
            "rep_s": [round(t, 2) for t in times],
            "spread_pct": round(100.0 * (ts[-1] - ts[0]) / med, 1),
            "rss_mb": round(rss, 1)}, err


class ServeClient:
    """Drives a ``--serve`` process: one analysis per submitted line."""

    def __init__(self, cwd, ready_timeout=300.0):
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "genrich_tpu", "--serve"],
            cwd=cwd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, env=_env())
        line = self._read_line(ready_timeout)
        assert line == "READY", line

    def _read_line(self, timeout):
        import select
        r, _, _ = select.select([self.proc.stdout], [], [], timeout)
        if not r:
            raise TimeoutError("serve: no response")
        return self.proc.stdout.readline().strip()

    def analyze(self, args: str, timeout: float) -> float:
        t0 = time.perf_counter()
        self.proc.stdin.write(args + "\n")
        self.proc.stdin.flush()
        line = self._read_line(timeout)
        assert line.startswith("OK"), line
        return time.perf_counter() - t0

    def close(self):
        try:
            self.proc.stdin.write("EXIT\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=30)
        except Exception:
            self.proc.kill()


def _serve_leg(client: ServeClient, bam: str, engine: str, d: str,
               warm_reps: int, cold_timeout: float) -> dict:
    """Cold + warm timings for one device engine via the server."""
    base = f"-t {bam} --engine {engine} " + " ".join(FLAGS)
    out = {}
    cold = client.analyze(f"{base} -o {engine}_cold.np", cold_timeout)
    out["cold_s"] = round(cold, 2)
    warms = []
    for i in range(warm_reps):
        warms.append(client.analyze(f"{base} -o {engine}_w{i}.np",
                                    max(cold_timeout / 2, 120.0)))
    ws = sorted(warms)
    warm = ws[len(ws) // 2]
    out["warm_s"] = round(warm, 2)
    out["warm_rep_s"] = [round(w, 3) for w in warms]
    out["load_s"] = round(cold - warm, 2)
    out["peaks"] = sum(1 for _ in open(
        os.path.join(d, f"{engine}_w{warm_reps - 1}.np")))
    return out


def bench_e2e(n_pairs: int = 2_000_000, include_jax: bool = True,
              timeout: float = 1800.0, chroms=None,
              reps: int = None) -> dict:
    reps = reps or int(os.environ.get("GENRICH_BENCH_E2E_REPS", "3"))
    bam = _bam_path(n_pairs, chroms)
    ref = _oracle_bin()
    genome = sum(l for _, l in (chroms or HG_CHROMS))
    out = {"n_pairs": n_pairs, "genome_bp": genome,
           "flags": " ".join(FLAGS), "reps": reps,
           "host": {"cpus": os.cpu_count(),
                    "loadavg": [round(x, 2)
                                for x in os.getloadavg()]}}
    # warm the page cache so the first timed rep doesn't also pay the
    # cold read of a multi-hundred-MB BAM (every later rep of every
    # contender would see it cached — same treatment for all)
    with open(bam, "rb") as f:
        while f.read(1 << 24):
            pass
    with tempfile.TemporaryDirectory() as d:
        # -v's counter block is a handful of stderr lines; its timing
        # cost is noise and it carries the record count.
        leg, err = _timed_leg([ref, "-t", bam, "-o", "ref.np", "-v"]
                              + FLAGS, d, timeout, reps)
        out["ref_s"] = leg["median_s"]
        out["ref"] = leg
        for line in err.splitlines():
            if "records analyzed" in line:
                out["records"] = int(line.split()[-1])

        # the exact engine never touches the TPU; skip any TPU-plugin
        # interpreter boot (costs ~2s under an axon sitecustomize)
        exact_cmd = [sys.executable, "-m", "genrich_tpu", "-t", bam,
                     "-o", "exact.np", "--engine", "exact", "-v"] \
            + FLAGS
        leg, _ = _timed_leg(exact_cmd, d, timeout, reps,
                            extra_env={"PALLAS_AXON_POOL_IPS": ""})
        out["exact_s"] = leg["median_s"]
        out["exact"] = leg
        ref_np = open(os.path.join(d, "ref.np"), "rb").read()
        out["exact_match"] = \
            ref_np == open(os.path.join(d, "exact.np"), "rb").read()
        out["exact_speedup"] = round(out["ref_s"] / out["exact_s"], 3)
        out["ref_peaks"] = len(ref_np.decode().splitlines())

        if include_jax:
            # device engines through the persistent serve process:
            # cold (program compile+load) vs warm (steady state)
            try:
                client = ServeClient(d)
            except Exception as exc:
                out["serve_error"] = f"{type(exc).__name__}: {exc}"
                client = None
            if client is not None:
                try:
                    for eng in ("jax", "sharded"):
                        try:
                            res = _serve_leg(client, bam, eng, d,
                                             warm_reps=3,
                                             cold_timeout=timeout)
                        except Exception as exc:
                            # a timed-out analysis leaves the server
                            # busy: record, kill, skip further legs
                            out[eng] = {"error":
                                        f"{type(exc).__name__}: "
                                        f"{exc}"}
                            client.proc.kill()
                            break
                        out[eng] = res
                        out[f"{eng}_s"] = res["warm_s"]
                        out[f"{eng}_speedup"] = round(
                            out["ref_s"] / res["warm_s"], 3)
                finally:
                    client.close()
    if "records" in out:
        out["exact_records_per_s"] = round(
            out["records"] / out["exact_s"], 1)
        out["ref_records_per_s"] = round(
            out["records"] / out["ref_s"], 1)
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    jax_flag = os.environ.get("GENRICH_BENCH_E2E_JAX", "1") != "0"
    print(json.dumps(bench_e2e(n, include_jax=jax_flag), indent=2))
