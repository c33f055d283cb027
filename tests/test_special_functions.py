"""Statistical special functions vs high-precision references.

The golden tests pin bit-parity with the reference binary; these pin
mathematical correctness against mpmath/scipy across wide input
ranges (the R-3.5.0 approximations are accurate to ~1e-15 relative in
their design ranges).
"""

from __future__ import annotations

import mpmath as mp
import numpy as np
from scipy import stats

from genrich_tpu.engine import chisq, pvalue

mp.mp.dps = 40


def test_pnorm_upper_log_vs_mpmath():
    xs = np.concatenate([
        np.linspace(-37, 37, 151),
        np.array([-1e-12, 0.0, 1e-12, 0.6744, 0.6745, 5.656, 5.657]),
    ])
    ours = pvalue.pnorm_upper_log(xs)
    for x, o in zip(xs, ours):
        ref = float(mp.log(mp.ncdf(-mp.mpf(x))))
        assert abs(o - ref) <= 1e-12 * max(1.0, abs(ref)), (x, o, ref)


def test_calc_pval_vs_scipy_lognorm():
    rng = np.random.RandomState(0)
    expt = rng.uniform(0.5, 200, 300).astype(np.float32)
    ctrl = rng.uniform(0.5, 50, 300).astype(np.float32)
    ours = pvalue.calc_pval(expt, ctrl)
    for e, c, o in zip(expt, ctrl, ours):
        mu = float(c)
        if mu > 7.0:
            sd = 10.0 * np.log10(mu)
            m2, s2 = mu * mu, sd * sd
            meanlog = np.log(m2 / np.sqrt(s2 + m2))
            sdlog = np.sqrt(np.log1p(s2 / m2))
        else:
            meanlog = np.log(mu) - 0.445999019652555
            sdlog = 0.944456478248262
        ref = -stats.norm.logsf((np.log(float(e)) - meanlog) / sdlog) \
            / np.log(10)
        if o < 1e30:
            assert abs(o - ref) <= 1e-5 * max(1.0, abs(ref)), \
                (e, c, o, ref)


def test_pchisq_vs_scipy():
    rng = np.random.RandomState(1)
    for df in (4, 6, 10, 50, 200, 400):
        xs = rng.uniform(0.01, 5 * df, 50)
        ours = chisq.pchisq_neglog10(xs, np.full(50, df))
        ref = -stats.chi2.logsf(xs, df) / np.log(10)
        np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_pgamma_small_x():
    xs = np.array([1e-10, 1e-5, 0.01, 0.5, 0.999])
    for alph in (2.0, 10.0, 100.0, 200.0):
        ours = chisq.pgamma(xs, np.full(len(xs), alph))
        ref = stats.gamma.logsf(xs, alph)
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-300)


def test_bh_qvalues_monotone_and_bounded():
    rng = np.random.RandomState(2)
    from genrich_tpu.engine.qvalue import qvalues
    p = np.sort(rng.uniform(0, 30, 500).astype(np.float32))
    lens = rng.randint(1, 1000, 500).astype(np.uint64)
    q = qvalues(p, lens, int(lens.sum()))
    assert (np.diff(q) >= 0).all()          # monotone in p
    assert (q >= 0).all()
    assert (q <= p + 1e-4).all()            # q <= p in -log10 space