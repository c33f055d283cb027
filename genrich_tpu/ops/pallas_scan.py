"""Pallas kernel: fused coverage scan + p-value over sorted events.

After the event sort, the pipeline is a chain of elementwise passes
(unpack deltas -> cumulative class sums -> canonical float32 coverage
-> log-normal -log10 p).  XLA runs the cumulative sum as its own pass
with materialized intermediates; this kernel fuses the whole chain
into one VMEM-resident sweep: each grid step loads one block of packed
deltas, computes a block-local cumulative sum, adds the running carry
(TPU grid steps execute sequentially, so a scalar-memory carry is
race-free), reconstructs coverage, and writes the p-values — one HBM
read and one write per element.

Status — MEASURED ON TPU (v5e, 2026-08-20): compiles through Mosaic
and runs at BLOCK=1024 (the earlier BLOCK=32768 unrolled 15
Hillis-Steele roll passes and blew up Mosaic compile time; 10 passes
over (1024, 4) compile in seconds).  At m = 2^22 packed deltas, both
this kernel and the equivalent lax chain (cumsum -> canon ->
calc_pval, one fused XLA program) run at the HBM roofline:
per-call medians 0.09 ms (pallas) vs 0.10 ms (lax), coverage bitwise
equal, -log10 p within 1.4e-7 relative.  Production keeps the lax
chain: at the roofline the two are within measurement noise, and the
lax ops fuse into the pipeline's existing programs while a pallas
call is one more executable to load per run (25-100 s on a
remote-compile relay).  Validated in interpreter mode on CPU by
tests/test_pallas_scan.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pileup_jax import canon_value
from .pvalue_jax import calc_pval

BLOCK = 1024


def _kernel(packed_ref, lam_ref, pval_ref, vals_ref, carry_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for i in range(4):
            carry_ref[i] = jnp.int32(0)   # SMEM takes scalar stores

    packed = packed_ref[:]
    deltas = jnp.stack(
        [(packed & 3) - 1, (packed >> 2) & 7, (packed >> 5) & 3,
         (packed >> 7) & 7], axis=-1)
    # Hillis-Steele inclusive scan (no cumsum primitive in Mosaic):
    # log2(BLOCK) passes of roll + mask + add, all VMEM-resident
    row = jax.lax.broadcasted_iota(jnp.int32, deltas.shape, 0)
    cum = deltas
    off = 1
    while off < BLOCK:
        shifted = pltpu.roll(cum, shift=off, axis=0)
        cum = cum + jnp.where(row >= off, shifted, 0)
        off <<= 1
    # carry in/out via SMEM scalars; vector-to-scalar only through
    # reductions and scalar stores (Mosaic-lowerable)
    col = jax.lax.broadcasted_iota(jnp.int32, deltas.shape, 1)
    carries = [carry_ref[i] for i in range(4)]
    carry_row = (carries[0] * (col == 0) + carries[1] * (col == 1)
                 + carries[2] * (col == 2) + carries[3] * (col == 3))
    cum = cum + carry_row
    for i in range(4):
        carry_ref[i] = carries[i] + jnp.sum(
            jnp.where(col == i, deltas, 0))
    vals = canon_value(cum)
    vals_ref[:] = vals
    lam = lam_ref[0]
    pval_ref[:] = calc_pval(vals, jnp.full_like(vals, lam))


@partial(jax.jit, static_argnames=("interpret",))
def coverage_pval_fused(packed: jnp.ndarray, lam: jnp.ndarray,
                        interpret: bool = False):
    """(coverage values, -log10 p) from sorted packed deltas.

    packed: int32 [M] (M a multiple of BLOCK) — the sorted per-event
    packed class deltas; lam: scalar background rate.
    """
    m = packed.shape[0]
    assert m % BLOCK == 0, "pad the event list to a BLOCK multiple"
    grid = (m // BLOCK,)
    pval, vals = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m,), jnp.float32),
            jax.ShapeDtypeStruct((m,), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
        interpret=interpret,
    )(packed, jnp.asarray([lam], jnp.float32))
    return vals, pval
