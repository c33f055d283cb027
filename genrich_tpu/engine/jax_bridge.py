"""Device-accelerated engine path for the CLI (--engine jax).

Runs the heavy per-chromosome numeric stages (pileup construction and
log-normal p-values) as the fused JAX kernel from genrich_tpu.ops,
then hands compact RLE p-value pileups back to the exact host code for
q-values, replicate combination, logging, and peak calling.  Float32
on device: results are approximate (~1e-4 relative on -log10 p), not
byte-identical — use the default numpy engine for parity.

Chromosome event lists are padded to power-of-two sizes so XLA
compiles a handful of kernel shapes, reused across chromosomes and
replicates.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.cfloat import SKIP
from .pileup import Pileup

F32 = np.float32


def _pad_pow2(n: int, lo: int = 1 << 10) -> int:
    size = lo
    while size < n:
        size <<= 1
    return size


class JaxEngine:
    """Per-run device context (lazy jax import; CPU or TPU)."""

    def __init__(self):
        import jax
        import jax.numpy as jnp
        from functools import partial
        from ..ops.pipeline_jax import tile_coverage, tile_stats

        self.jax = jax
        self.jnp = jnp

        @partial(jax.jit, static_argnums=())
        def _cov_pval(es, ee, ec, cs, ce, cc, excl, tile_len, lam,
                      factor):
            (starts, ends, ev, cr, excluded, live, frag,
             cfrag) = tile_coverage(es, ee, ec, cs, ce, cc, excl,
                                    tile_len,
                                    jnp.zeros(4, jnp.int32),
                                    jnp.zeros(4, jnp.int32))
            pv = tile_stats(ev, cr, excluded, factor, lam)
            return starts, ends, ev, cr, pv, excluded, live, frag, cfrag

        self._cov_pval = _cov_pval

    def _pad_excl(self, bed: List[int], chrom_len: int,
                  max_pairs: int = 64) -> "np.ndarray":
        """Fixed-shape exclusion array (shape stability across jits)."""
        pairs = len(bed) // 2
        while pairs > max_pairs:
            max_pairs *= 4
        excl = np.full((max_pairs, 2), chrom_len, np.int32)
        for i in range(0, len(bed), 2):
            excl[i // 2] = (bed[i], bed[i + 1])
        return excl

    def _pad_events(self, ev, tile_len: int, size: int):
        jnp = self.jnp
        s = np.full(size, tile_len, np.int32)
        e = np.full(size, tile_len, np.int32)
        c = np.zeros(size, np.int32)
        if ev is not None:
            n = len(ev[0])
            s[:n] = ev[0]
            e[:n] = ev[1]
            c[:n] = ev[2]
        return jnp.asarray(s), jnp.asarray(e), jnp.asarray(c)

    def chrom_pvalues(self, expt_ev, ctrl_ev, bed: List[int],
                      chrom_len: int, lam: float, factor: float
                      ) -> Tuple[Pileup, Pileup, Pileup]:
        """(expt, ctrl, pval) RLE pileups for one chromosome."""
        jnp = self.jnp
        n = max(len(expt_ev[0]) if expt_ev else 1,
                len(ctrl_ev[0]) if ctrl_ev else 1)
        size = _pad_pow2(n)
        es, ee, ec = self._pad_events(expt_ev, chrom_len, size)
        cs, ce, cc = self._pad_events(ctrl_ev, chrom_len, size)
        excl = self._pad_excl(bed, chrom_len)

        out = self._cov_pval(es, ee, ec, cs, ce, cc,
                             jnp.asarray(excl), jnp.int32(chrom_len),
                             jnp.float32(lam), jnp.float32(factor))
        (starts, ends, ev, cr, pv, excluded, live, frag,
         cfrag) = (np.asarray(x) for x in out)
        keep = live & (ends > starts)
        starts, ends, ev, cr, pv, excluded = (
            a[keep] for a in (starts, ends, ev, cr, pv, excluded))
        ctrl_v = np.where(excluded, SKIP,
                          np.maximum(F32(factor) * cr, F32(lam)))
        expt_v = np.where(excluded, F32(0.0), ev)
        # coalesce equal adjacent p-values into RLE runs
        if len(pv):
            brk = np.flatnonzero(np.diff(pv) != 0)
            last = np.append(brk, len(pv) - 1)
            pu = Pileup(ends[last].astype(np.int64),
                        pv[last].astype(F32))
            epu = Pileup(ends[last].astype(np.int64),
                         expt_v[last].astype(F32))
            cpu_ = Pileup(ends[last].astype(np.int64),
                          ctrl_v[last].astype(F32))
        else:
            pu = Pileup(np.array([chrom_len], np.int64),
                        np.zeros(1, F32))
            epu = Pileup(pu.end, np.zeros(1, F32))
            cpu_ = Pileup(pu.end, np.full(1, F32(lam)))
        return epu, cpu_, pu

    def chrom_frag_sums(self, expt_ev, ctrl_ev, bed: List[int],
                        chrom_len: int) -> Tuple[float, float]:
        """(expt fragLen, ctrl fragLen) for lambda/factor (f32)."""
        jnp = self.jnp
        n = max(len(expt_ev[0]) if expt_ev else 1,
                len(ctrl_ev[0]) if ctrl_ev else 1)
        size = _pad_pow2(n)
        es, ee, ec = self._pad_events(expt_ev, chrom_len, size)
        cs, ce, cc = self._pad_events(ctrl_ev, chrom_len, size)
        excl = self._pad_excl(bed, chrom_len)
        out = self._cov_pval(es, ee, ec, cs, ce, cc,
                             jnp.asarray(excl), jnp.int32(chrom_len),
                             jnp.float32(1.0), jnp.float32(1.0))
        return float(out[7]), float(out[8])
