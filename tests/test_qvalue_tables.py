"""Cached distinct-table BH == row-wise BH.

_save_pval caches each chromosome's distinct (p, bp) table on the
Pileup (engine/pvalue.calc_pval_unique_tab); collect_pvals merges the
cached tables when every pileup carries one and falls back to row-wise
grouping otherwise (multi-replicate Fisher pileups).  Both paths must
produce the identical genome-wide histogram (hashPval/computeQval,
Genrich.c:146-401).
"""

import numpy as np
import pytest

from genrich_tpu.engine.pileup import Pileup
from genrich_tpu.engine import pvalue, qvalue
from genrich_tpu.utils.cfloat import SKIP

F32 = np.float32


def _random_pileup(rng, n, with_skip=True):
    lens = rng.randint(1, 400, n).astype(np.int64)
    ends = np.cumsum(lens)
    # quantized coverage pools (real pileups are fraction-quantized)
    ev = (rng.randint(0, 40, n) / F32(8.0)).astype(F32)
    cv = np.full(n, F32(2.5))
    if with_skip:
        cv[rng.rand(n) < 0.07] = F32(SKIP)
    return ends, ev, cv


@pytest.mark.parametrize("with_skip", [False, True])
@pytest.mark.parametrize("seed", [0, 7])
def test_cached_tab_matches_rowwise(seed, with_skip):
    rng = np.random.RandomState(seed)
    cached, plain = [], []
    for n in (3000, 1, 4096):
        ends, ev, cv = _random_pileup(rng, n, with_skip)
        pv, tab = pvalue.calc_pval_unique_tab(ends, ev, cv)
        assert np.array_equal(pv, pvalue.calc_pval_unique(ev, cv))
        cached.append(Pileup(ends, pv, tab=tab))
        plain.append(Pileup(ends.copy(), pv.copy()))

    pd_c, pl_c = qvalue.collect_pvals(cached)
    pd_p, pl_p = qvalue.collect_pvals(plain)
    assert np.array_equal(pd_c, pd_p)
    assert np.array_equal(pl_c, pl_p)
    # SKIP rows contribute nothing
    total = sum(int(np.diff(p.end, prepend=0)[p.cov != SKIP].sum())
                for p in plain)
    assert int(pl_c.sum()) == total
    # and identical q-values downstream
    qc = qvalue.qvalues(pd_c, pl_c, total + 17)
    qp = qvalue.qvalues(pd_p, pl_p, total + 17)
    assert np.array_equal(qc, qp)


def test_mixed_tab_presence_falls_back():
    """One pileup without a table forces the row-wise path; results
    must still match the all-cached grouping."""
    rng = np.random.RandomState(3)
    ends, ev, cv = _random_pileup(rng, 2000)
    pv, tab = pvalue.calc_pval_unique_tab(ends, ev, cv)
    both = [Pileup(ends, pv, tab=tab), Pileup(ends.copy(), pv.copy())]
    pd, pl = qvalue.collect_pvals(both)
    pd2, pl2 = qvalue.collect_pvals([both[0], both[0]])
    assert np.array_equal(pd, pd2)
    assert np.array_equal(pl, pl2)


def test_tab_handles_negative_zero():
    """-0.0 and +0.0 p-values must land in one distinct bucket."""
    ends = np.array([10, 20, 30], np.int64)
    pv = np.array([-0.0, 0.0, 1.5], F32)
    p = Pileup(ends, pv)
    pd, pl = qvalue.collect_pvals([p])
    assert len(pd) == 2
    assert pd[0] == F32(0.0) and int(pl[0]) == 20
