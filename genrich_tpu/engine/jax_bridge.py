"""Device-accelerated engine path for the CLI (--engine jax).

Runs the genome-scale numeric stages — pileup construction, log-normal
p-values, BH q-values, peak calling — on the device, keeping the
per-interval arrays resident in HBM between stages.  Only compact data
crosses the device->host link: fragment-length scalars, the distinct
(p -> bp) table for BH, and the final peak records.  On a tunneled TPU
the link runs at ~15 MB/s, so this residency is what makes the device
path faster end-to-end than the exact numpy engine (the old bridge
shipped ~180 MB of dense intervals per chromosome).

Float32 on device: results are approximate (~1e-4 relative on
-log10 p), not byte-identical — use the default numpy engine for
parity.  Reference semantics mirrored per stage:
  coverage/pileup   savePileupExpt/Ctrl   Genrich.c:2052-2295
  p-values          savePval/calcPval     Genrich.c:1628-1794
  q-values          computeQval           Genrich.c:146-401
  peak calling      callPeaks             Genrich.c:977-1069

Chromosome events upload tight (starts int32 + lengths uint16 +
counts uint8 at a 1/16-bucket granule) and a trivial device program
expands them to one global power-of-two bucket, so XLA compiles a
handful of kernel shapes, reused across chromosomes and replicates;
compiled programs persist in an on-disk cache, partitioned by
(platform, relay-vs-local, host ISA) (~/.cache/genrich_tpu/xla or
$GENRICH_TPU_XLA_CACHE) because remote compilation can cost ~15 s
per shape.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.cfloat import SKIP
from .host_fallback import INT32_MAX, HostChromMixin
from .perf import PerfMixin
from .pileup import Pileup

F32 = np.float32
PEAK_CAP = 1 << 15        # per-chrom device peak rows (cap checked)


def _pad_pow2(n: int, lo: int = 1 << 10) -> int:
    size = lo
    while size < n:
        size <<= 1
    return size


from ..utils.xla_cache import enable_compile_cache \
    as _enable_compile_cache


class JaxEngine(PerfMixin, HostChromMixin):
    """Per-run device context (lazy jax import; CPU or TPU).

    Stage methods keep per-chromosome interval arrays resident on the
    device in ``self._chrom``; the pipeline decides (by requested
    outputs) whether to finish on device (`peaks_chrom`) or pull
    compact RLE pileups back to the host (`pvalue_pileups`).
    """

    def __init__(self):
        _enable_compile_cache()
        import jax
        import jax.numpy as jnp
        from ..ops import compact_jax
        from ..ops.pipeline_jax import tile_coverage, tile_stats
        from ..ops.peaks_jax import call_peaks

        self.jax = jax
        self.jnp = jnp
        self._chrom: Dict[int, dict] = {}
        self._qtable = None
        # device-resident padded empty event arrays keyed by
        # (size, sentinel): a no-ctrl run otherwise uploads ~25 MB of
        # constant padding per chromosome per analysis — on a
        # ~15 MB/s tunneled link that is most of the warm-run cost.
        # Survives release() (serve mode reuses it across analyses).
        self._empty_cache: Dict[tuple, tuple] = {}

        zero4 = lambda: jnp.zeros(4, jnp.int32)  # noqa: E731

        @jax.jit
        def _coverage(es, ee, ec, cs, ce, cc, excl, tile_len):
            (starts, ends, ev, cr, excluded, live, frag,
             cfrag) = tile_coverage(es, ee, ec, cs, ce, cc, excl,
                                    tile_len, zero4(), zero4())
            return starts, ends, ev, cr, excluded, live, frag, cfrag

        @jax.jit
        def _stats(ev, cr, excluded, lam, factor):
            return tile_stats(ev, cr, excluded, factor, lam)

        @jax.jit
        def _rle(starts, ends, pv, ev, cr, excluded, live, lam,
                 factor):
            return compact_jax.rle_runs(starts, ends, pv, ev, cr,
                                        excluded, live, lam, factor)

        @jax.jit
        def _distinct(starts, ends, pv, live):
            return compact_jax.distinct_pvals(starts, ends, pv, live)

        @jax.jit
        def _rle_pv(starts, ends, pv, live, chrom_len):
            return compact_jax.rle_pv(starts, ends, pv, live,
                                      chrom_len)

        @jax.jit
        def _merge_fisher(ends_list, pv_list):
            return compact_jax.merge_fisher(ends_list, pv_list)

        from functools import partial

        @partial(jax.jit, static_argnames=("size",))
        def _expand16(s, ln, c, tile_len, size):
            # tight uint16-length upload -> full [size] event triple
            pad = size - s.shape[0]
            e = s + ln.astype(jnp.int32)
            fill = jnp.full((pad,), tile_len, jnp.int32)
            return (jnp.concatenate([s, fill]),
                    jnp.concatenate([e, fill]),
                    jnp.concatenate([c, jnp.zeros((pad,),
                                                  jnp.uint8)]))

        @partial(jax.jit, static_argnames=("size",))
        def _expand32(s, e, c, tile_len, size):
            pad = size - s.shape[0]
            fill = jnp.full((pad,), tile_len, jnp.int32)
            return (jnp.concatenate([s, fill]),
                    jnp.concatenate([e, fill]),
                    jnp.concatenate([c, jnp.zeros((pad,),
                                                  jnp.uint8)]))

        self._expand16 = _expand16
        self._expand32 = _expand32

        @partial(jax.jit, static_argnames=("min_len", "max_gap",
                                           "use_q", "k_peaks"))
        def _peaks(starts, ends, pv, live, tab_p, tab_q, min_pq,
                   min_auc, min_len, max_gap, use_q, k_peaks):
            if use_q:
                qv = compact_jax.assign_qvals(pv, tab_p, tab_q)
                stat = qv
            else:
                qv = jnp.full_like(pv, SKIP)
                stat = pv
            res = call_peaks(starts, ends, stat, pv, qv, live,
                             min_pq, min_auc, min_len, max_gap,
                             k_peaks=k_peaks)
            # pack the emitted columns into two buffers so the host
            # pulls a chromosome's peaks in two transfers instead of
            # seven (each pull is a round trip on a tunneled link)
            ints = jnp.stack([res.start, res.end, res.summit_pos,
                              res.valid.astype(jnp.int32)])
            flts = jnp.stack([res.auc, res.summit_pval,
                              res.summit_qval])
            return ints, flts, res.n_peaks

        self._coverage = _coverage
        self._stats_fn = _stats
        self._rle_fn = _rle
        self._distinct_fn = _distinct
        self._rle_pv_fn = _rle_pv
        self._merge_fisher_fn = _merge_fisher
        self._peaks_fn = _peaks
        self._reps: List[Dict[int, tuple]] = []
        self.begin_run()

    # --- warmup ---------------------------------------------------------

    def prepare(self, max_events: int, max_excl_pairs: int,
                min_pq: float, min_auc: float, min_len: int,
                max_gap: int, use_q: bool,
                max_chrom_len: int = 0) -> None:
        """Fix one global shape bucket and prewarm device programs.

        Called by the pipeline once all events are parsed: every
        chromosome pads to the same power-of-two event bucket, so each
        stage is ONE compiled program per run instead of one per
        (program x chrom-size bucket).  Background threads then issue
        dummy calls for every stage so executable compile/load —
        25-100 s per program on a tunneled TPU — proceeds concurrently
        instead of serializing at first real use.  Harmless on fast
        backends: the dummy inputs are tiny-to-allocate and dispatch
        waits coalesce in jax's compile cache.
        """
        import threading

        jnp = self.jnp
        self._bucket = _pad_pow2(max_events)
        pairs = 64
        while max_excl_pairs > pairs:
            pairs *= 4
        self._excl_pairs = pairs
        # serve mode: an analysis with the same derived shapes and
        # peak parameters needs no re-warm (the programs are already
        # compiled and loaded); a different workload re-derives and
        # re-warms.  release() clears the per-run arrays only.
        key = (self._bucket, pairs, min_len, max_gap, use_q)
        if getattr(self, "_prep_key", None) == key:
            return
        self._prep_key = key
        b = self._bucket
        n_iv = 1 + 4 * b + 2 * pairs

        def mk(shape, dtype):
            return jnp.zeros(shape, dtype)

        def warm_coverage():
            ev = mk(b, jnp.int32)
            cnt = mk(b, jnp.uint8)
            excl = jnp.full((pairs, 2), 1 << 20, jnp.int32)
            self._coverage(ev, ev, cnt, ev, ev, cnt, excl,
                           jnp.int32(1 << 20))

        def warm_stats():
            f = mk(n_iv, jnp.float32)
            self._stats_fn(f, f, mk(n_iv, bool), jnp.float32(1.0),
                           jnp.float32(1.0))

        def warm_distinct():
            i = mk(n_iv, jnp.int32)
            self._distinct_fn(i, i, mk(n_iv, jnp.float32),
                              mk(n_iv, bool))

        def warm_peaks():
            i = mk(n_iv, jnp.int32)
            f = mk(n_iv, jnp.float32)
            tab = mk(1 << 13, jnp.float32) if use_q \
                else mk(1, jnp.float32)
            self._peaks_fn(i, i, f, mk(n_iv, bool), tab, tab,
                           jnp.float32(min_pq), jnp.float32(min_auc),
                           min_len=min_len, max_gap=max_gap,
                           use_q=use_q,
                           k_peaks=min(PEAK_CAP, n_iv))

        targets = [warm_coverage, warm_stats]
        if use_q:
            targets.append(warm_distinct)
        targets.append(warm_peaks)
        self._warm_threads = []
        for fn in targets:
            t = threading.Thread(target=lambda f=fn: self._swallow(f),
                                 daemon=True)
            t.start()
            self._warm_threads.append(t)

    @staticmethod
    def _swallow(fn):
        try:
            fn()
        except Exception:
            pass    # warmup is an optimization only

    # --- input staging -------------------------------------------------

    def _pad_excl(self, bed: List[int], chrom_len: int,
                  max_pairs: int = 64) -> "np.ndarray":
        """Fixed-shape exclusion array (shape stability across jits)."""
        max_pairs = getattr(self, "_excl_pairs", max_pairs)
        pairs = len(bed) // 2
        while pairs > max_pairs:
            max_pairs *= 4
        excl = np.full((max_pairs, 2), chrom_len, np.int32)
        for i in range(0, len(bed), 2):
            excl[i // 2] = (bed[i], bed[i + 1])
        return excl

    def _pad_events(self, ev, tile_len: int, size: int):
        """Stage one chromosome's events to the device at ``size``.

        Upload cost is link-bandwidth-priced (~15-25 MB/s tunneled),
        so the host ships the *tight* power-of-two of the actual
        event count — starts as int32, lengths as uint16 when they
        fit (ATAC windows and real fragments are short), counts as
        uint8 (the 1..10 multimapper codes) — and a trivial device
        program reconstructs ends and pads out to the global shape
        bucket.  7 bytes/event at ~62% of the bucket beats the dense
        9-byte full-bucket upload by ~2.3x on the wire; every
        downstream program still sees exactly one [bucket] shape.
        """
        jnp = self.jnp
        if ev is None:
            key = (size, int(tile_len))
            cached = self._empty_cache.get(key)
            if cached is None:
                full = self._put(np.full(size, tile_len, np.int32))
                zero = self._put(np.zeros(size, np.uint8))
                # start and end share one buffer (inputs read-only)
                cached = (full, full, zero)
                self._empty_cache[key] = cached
            return cached
        n = len(ev[0])
        # tight = n rounded to a 1/16-bucket granule: at most 16
        # distinct (tight, size) expand shapes per bucket (each a
        # trivial compile, disk-cached), for up to ~2.3x fewer bytes
        # on the wire than a dense 9-byte full-bucket upload
        granule = max(size // 16, 1 << 14)
        tight = min(-(-max(n, 1) // granule) * granule, size)
        s = np.full(tight, tile_len, np.int32)
        c = np.zeros(tight, np.uint8)
        s[:n] = ev[0]
        c[:n] = ev[2]
        # uint16 wire only when every length fits AND none is negative
        # (ends < starts would wrap to a huge uint16); mirrors the
        # sharded _stage_events guard
        lens = np.asarray(ev[1]) - np.asarray(ev[0])
        if n and int(lens.max()) < (1 << 16) and int(lens.min()) >= 0:
            ln = np.zeros(tight, np.uint16)
            ln[:n] = lens
            return self._call(self._expand16, self._put(s),
                              self._put(ln), self._put(c),
                              jnp.int32(tile_len), size=size)
        e = np.full(tight, tile_len, np.int32)
        e[:n] = ev[1]
        return self._call(self._expand32, self._put(s), self._put(e),
                          self._put(c), jnp.int32(tile_len),
                          size=size)

    # --- stage 1: coverage (resident) + fragment sums -------------------

    def coverage_chrom(self, cidx: int, expt_ev, ctrl_ev,
                       bed: List[int], chrom_len: int) -> tuple:
        """Pileup coverage for one chromosome (async submission).

        Interval arrays stay on device; the returned handle holds the
        two weighted fragment-length scalars (savePileupExpt's return
        and calcFactor's sweep, Genrich.c:2168-2295, 1980-2046) as
        device scalars — ``coverage_finish`` resolves a batch of them
        in one blocking pass, so chromosome N+1's upload overlaps
        chromosome N's device compute instead of serializing on a
        per-chromosome round trip.  A chromosome longer than 2^31-1 bp
        overflows device int32 coordinates and is computed on the host
        instead (exact-engine operations; see host_fallback.py).
        """
        if chrom_len > INT32_MAX:
            return self.host_coverage_chrom(cidx, expt_ev, ctrl_ev,
                                            bed, chrom_len)
        jnp = self.jnp
        n = max(len(expt_ev[0]) if expt_ev else 1,
                len(ctrl_ev[0]) if ctrl_ev else 1)
        size = getattr(self, "_bucket", 0) or _pad_pow2(n)
        if size < n:             # safety: prepare() saw fewer events
            size = _pad_pow2(n)
        es, ee, ec = self._pad_events(expt_ev, chrom_len, size)
        cs, ce, cc = self._pad_events(ctrl_ev, chrom_len, size)
        excl = self._put(self._pad_excl(bed, chrom_len))
        out = self._call(self._coverage, es, ee, ec, cs, ce, cc, excl,
                         jnp.int32(chrom_len))
        (starts, ends, ev, cr, excluded, live, frag, cfrag) = out
        self._chrom[cidx] = {
            "starts": starts, "ends": ends, "ev": ev, "cr": cr,
            "excluded": excluded, "live": live, "len": chrom_len,
        }
        return frag, cfrag

    def coverage_finish(self, handles: List[tuple]
                        ) -> Tuple[float, float]:
        """Resolve queued coverage handles to the two fragment sums.

        One blocking gather for the whole batch; accumulation order is
        the submission order (identical to the per-chromosome float
        adds the sequential loop performed).
        """
        t0 = time.perf_counter()
        vals = self.jax.device_get(handles)
        p = self.perf
        p["fetch_n"] += 1
        p["fetch_s"] += time.perf_counter() - t0
        frag = 0.0
        cfrag = 0.0
        for fe, fc in vals:
            frag += float(fe)
            cfrag += float(fc)
        return frag, cfrag

    # --- stage 2: p-values (resident) -----------------------------------

    def stats_all(self, lam: float, factor: float) -> None:
        """-log10 p per interval for every resident chromosome."""
        jnp = self.jnp
        self._lam = F32(lam)
        self._factor = F32(factor)
        for st in self._chrom.values():
            if st.get("host"):
                continue
            st["pv"] = self._call(self._stats_fn, st["ev"], st["cr"],
                                  st["excluded"], jnp.float32(lam),
                                  jnp.float32(factor))
        self.host_stats(lam, factor)

    # --- multi-replicate: archive + device Fisher ------------------------

    def archive_replicate(self) -> None:
        """Compact this replicate's p-values to RLE and free coverage.

        Each chromosome's (ends, pv) runs stay resident (sliced to a
        power-of-two bucket of the run count); the dense coverage
        arrays are released.  Used when a later replicate follows and
        the combination (Fisher) happens on device at findPeaks time.
        """
        jnp = self.jnp
        rep: Dict[int, tuple] = {}
        for cidx, st in self._chrom.items():
            if st.get("host"):
                rep[cidx] = self.host_archive(st)
                continue
            e_b, pv_b, b = self._call(
                self._rle_pv_fn, st["starts"], st["ends"], st["pv"],
                st["live"], jnp.int32(st["len"]))
            size = min(_pad_pow2(int(self._fetch(b)), lo=1 << 8),
                       e_b.shape[0])
            rep[cidx] = (e_b[:size], pv_b[:size], st["len"])
        self._reps.append(rep)
        self._chrom.clear()

    def finalize_fisher(self) -> None:
        """combinePval (Genrich.c:612-667) on device.

        Merges every replicate's RLE breakpoints per chromosome and
        combines -log10 p via the chi-squared upper tail
        (ops/chisq_jax.py); the result repopulates ``self._chrom`` so
        q-values and peak calling run unchanged.
        """
        chroms = sorted({c for rep in self._reps for c in rep})
        for cidx in chroms:
            present = [rep[cidx] for rep in self._reps if cidx in rep]
            if any(self.host_is_archived(r) for r in present):
                self.host_fisher(cidx, present)
                continue
            ends_t = tuple(r[0] for r in present)
            pv_t = tuple(r[1] for r in present)
            starts, ends, comb, live = self._call(
                self._merge_fisher_fn, ends_t, pv_t)
            self._chrom[cidx] = {
                "starts": starts, "ends": ends, "pv": comb,
                "live": live, "len": present[0][2],
            }
        self._reps.clear()

    def pval_pileup(self, cidx: int) -> Pileup:
        """The p-value RLE pileup alone (host fallback paths)."""
        jnp = self.jnp
        st = self._chrom[cidx]
        if st.get("host"):
            return self.host_pval_pileup(st)
        e_b, pv_b, b = self._call(self._rle_pv_fn, st["starts"],
                                  st["ends"], st["pv"], st["live"],
                                  jnp.int32(st["len"]))
        nb = int(b)
        if nb == 0:
            return Pileup(np.array([st["len"]], np.int64),
                          np.zeros(1, F32))
        return Pileup(np.asarray(e_b[:nb]).astype(np.int64),
                      np.asarray(pv_b[:nb]).astype(F32))

    # --- host-RLE path (for -f/-k logs, Fisher, -X) ---------------------

    def pvalue_pileups(self, cidx: int
                       ) -> Tuple[Pileup, Pileup, Pileup]:
        """(expt, ctrl, pval) RLE pileups, compacted on device first."""
        jnp = self.jnp
        st = self._chrom[cidx]
        if st.get("host"):
            return self.host_pvalue_pileups(st)
        e_b, pv_b, ev_b, cv_b, b = self._call(
            self._rle_fn, st["starts"], st["ends"], st["pv"],
            st["ev"], st["cr"], st["excluded"], st["live"],
            jnp.float32(self._lam), jnp.float32(self._factor))
        nb = int(b)
        if nb == 0:
            chrom_len = st["len"]
            pu = Pileup(np.array([chrom_len], np.int64),
                        np.zeros(1, F32))
            return (Pileup(pu.end, np.zeros(1, F32)),
                    Pileup(pu.end, np.full(1, F32(self._lam))), pu)
        e_np, pv_np, ev_np, cv_np = self._fetch_many(
            (e_b[:nb], pv_b[:nb], ev_b[:nb], cv_b[:nb]))
        ends = e_np.astype(np.int64)
        return (Pileup(ends, ev_np.astype(F32)),
                Pileup(ends, cv_np.astype(F32)),
                Pileup(ends, pv_np.astype(F32)))

    # --- stage 3: q-values ----------------------------------------------

    def qvalue_table(self, genome_len: int) -> bool:
        """Genome-wide BH from device-collected distinct p-values.

        Distinct (p, bp) pairs per chromosome are compacted on device
        and merged on host (they number in the thousands: coverage
        values are fraction-quantized); the q sweep reuses the exact
        engine's float32 math (computeQval, Genrich.c:352-401).
        Returns the "all q-values are 1" warning condition.
        """
        from . import qvalue
        jnp = self.jnp
        ps, ws = [], []
        # submit every chromosome's distinct-compaction program first,
        # then resolve: the fetches overlap the remaining dispatches
        pend = []
        for st in self._chrom.values():
            if st.get("host"):
                hp, hw = self.host_distinct(st)
                if len(hp):
                    ps.append(np.asarray(hp, F32))
                    ws.append(np.asarray(hw, np.uint64))
                continue
            pend.append(self._call(self._distinct_fn, st["starts"],
                                   st["ends"], st["pv"], st["live"]))
        if pend:
            # one pull for every chromosome's count, then one pull
            # for all the sliced tables (each np.asarray here costs a
            # full relay round trip)
            nds = self._fetch_many([d for _, _, d in pend])
            live = [(pv_d[:int(nd)], w_d[:int(nd)])
                    for (pv_d, w_d, _), nd in zip(pend, nds)
                    if int(nd)]
            if live:
                flat = self._fetch_many(
                    [x for pair in live for x in pair])
                for i in range(0, len(flat), 2):
                    ps.append(flat[i])
                    ws.append(flat[i + 1].astype(np.uint64))
        if not ps:
            self._qtable = (jnp.zeros(1, jnp.float32),
                            jnp.zeros(1, jnp.float32))
            self._qtable_host = (np.zeros(0, F32), np.zeros(0, F32))
            return False
        # fixed floor (lo) so the peaks program's table shape is known
        # to prepare()'s prewarm (distinct fraction-quantized p-values
        # rarely exceed a few thousand)
        uv, qv, tab_p, tab_q, _, all_one = \
            qvalue.merge_distinct_tables(ps, ws, genome_len,
                                         lo=1 << 13)
        self._qtable = (self._put(tab_p), self._put(tab_q))
        self._qtable_host = (uv, qv)
        return all_one

    # --- stage 4: peaks (device) ----------------------------------------

    def peaks_submit(self, cidx: int, min_pq: float, min_auc: float,
                     min_len: int, max_gap: int, use_q: bool):
        """Dispatch peak calling for one chromosome (no blocking).

        Returns an opaque handle for ``peaks_fetch``, or None for a
        host-fallback chromosome.  Submitting every chromosome before
        fetching any lets the device pipeline the per-chromosome
        programs while the host is still dispatching.
        """
        jnp = self.jnp
        st = self._chrom[cidx]
        if st.get("host"):
            return None    # pipeline falls back to the host caller
        if use_q:
            tab_p, tab_q = self._qtable
        else:
            tab_p = tab_q = jnp.zeros(1, jnp.float32)
        cap = min(PEAK_CAP, st["starts"].shape[0])
        ints, flts, n = self._call(
            self._peaks_fn, st["starts"], st["ends"], st["pv"],
            st["live"], tab_p, tab_q, jnp.float32(min_pq),
            jnp.float32(min_auc), min_len=min_len, max_gap=max_gap,
            use_q=use_q, k_peaks=cap)
        return (ints, flts, n, cap)

    def peaks_fetch(self, handle):
        """Resolve a ``peaks_submit`` handle.

        Returns (start, end, auc, summit_pval, summit_qval,
        summit_pos) numpy arrays of emitted peaks, in genomic order,
        or None if the per-chrom candidate cap was exceeded (caller
        falls back to the host peak caller).
        """
        ints_d, flts_d, n_d, cap = handle
        if int(self._fetch(n_d)) > cap:
            return None
        ints = self._fetch(ints_d)
        valid = ints[3] != 0
        if not valid.any():
            z64 = np.zeros(0, np.int64)
            zf = np.zeros(0, F32)
            return (z64, z64, zf, zf, zf, z64)
        flts = self._fetch(flts_d)
        k = np.flatnonzero(valid)
        return (ints[0, k].astype(np.int64),
                ints[1, k].astype(np.int64),
                flts[0, k], flts[1, k], flts[2, k],
                ints[2, k].astype(np.int64))

    def peaks_chrom(self, cidx: int, min_pq: float, min_auc: float,
                    min_len: int, max_gap: int, use_q: bool):
        """Blocking submit+fetch (single-chromosome convenience)."""
        h = self.peaks_submit(cidx, min_pq, min_auc, min_len, max_gap,
                              use_q)
        return None if h is None else self.peaks_fetch(h)

    def release(self) -> None:
        self._chrom.clear()
        self._reps.clear()
        self._qtable = None
