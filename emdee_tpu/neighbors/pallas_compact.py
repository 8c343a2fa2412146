"""Pallas window-compaction kernel for the shift rebin — NEGATIVE RESULT.

`cell_dense._route_axis_pass` compacts each cell's 3C-candidate window into C
slots by log-shift rounds (roll + select per bit of the per-element shift
distance).  Hypothesis: as XLA ops every round round-trips every field
through HBM (7 rounds × ~10 fields × 3 passes), so a VMEM-resident kernel
that reads each field once should win.

Measured on v5e at the 100k benchmark (C=32, k=96): **the kernel LOSES** —
2.26 ms/rebin with `pltpu.roll`, 1.45 ms with `jnp.roll`, vs 0.90 ms for the
plain XLA rounds.  Post-mortem: XLA already fuses the select chains well and
its rolls are cheap lane copies, while the kernel pays (a) 96→128 lane
padding on every block (inputs) and 32→128 on outputs, (b) ~27 block DMAs ×
~20 grid steps of fixed overhead, and (c) Mosaic's size-96 roll lowering.
The rebin is NOT bandwidth-bound at this size — the hypothesis was wrong.

Kept behind `EMDEE_PALLAS_COMPACT=1` (default off) for future hardware; the
math is bitwise-identical to the XLA path (pure data movement), verified by
differential test.  The instructive dead end is documented in docs/PERF.md
next to the C=24 campaign.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_compact_kernel(k: int, c: int, n_bits: int, nf: int, use_pltpu_roll: bool = True):
    # The log-shift rounds never read lanes that wrapped around the roll
    # (the `iota < k − sh` guard), so the roll itself need not be a true
    # size-k circular shift — pltpu.roll's native lane rotation (within the
    # 128-padded physical tile) delivers the same guarded lanes far cheaper
    # than jnp.roll's size-96 concat lowering.
    # left-shift by sh ≡ circular roll right by k − sh (pltpu.roll requires
    # a non-negative shift).
    roll = (lambda a, sh: pltpu.roll(a, k - sh, 1)) if use_pltpu_roll else (
        lambda a, sh: jnp.roll(a, -sh, axis=1)
    )

    def kernel(s_ref, *refs):
        in_refs = refs[:nf]
        out_refs = refs[nf:]
        s = s_ref[...]
        iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        fields = [r[...] for r in in_refs]
        for j in range(n_bits):
            sh = 1 << j
            mv = s & sh  # int32 0/sh — Mosaic cannot roll i1 vregs
            # An element arrives at lane l from lane l+2ʲ — unless the
            # source index wrapped around the (circular) roll.
            arrive = (roll(mv, sh) != 0) & (iota < k - sh)
            fields = [jnp.where(arrive, roll(f, sh), f) for f in fields]
            s = jnp.where(arrive, roll(s, sh) - sh, s)
            # Vacated lanes keep a stale copy of the mover; zero its shift so
            # the duplicate never moves again.
            s = jnp.where((mv != 0) & ~arrive, 0, s)
        for out, f in zip(out_refs, fields):
            out[...] = f[:, :c]

    return kernel


def compact_window_pallas(s: jax.Array, cand: list, c: int, interpret: bool = False) -> list:
    """Compact (rows, 3C) candidate windows into (rows, C) slots.

    s: (rows, 3C) int32 left-shift distances (0 on junk lanes);
    cand: list of (rows, 3C) field arrays (f32 or int32).
    Returns the list of (rows, C) compacted fields, identical to slicing the
    XLA log-shift rounds' output.
    """
    rows, k = s.shape
    n_bits = max(1, int(np.ceil(np.log2(k))))
    nf = len(cand)
    # Block rows sized so double-buffered in/out block buffers (lane-padded
    # 3C→128·k and C→128) stay within scoped VMEM alongside the caller's
    # other live buffers: ~14 inputs + ~13 outputs × 2 buffers each.
    r_blk = min(256, -(-rows // 8) * 8)
    grid = -(-rows // r_blk)

    in_spec = pl.BlockSpec((r_blk, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((r_blk, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    call_kwargs = dict(
        grid=(grid,),
        in_specs=[in_spec] * (1 + nf),
        out_specs=[out_spec] * nf,
        out_shape=[jax.ShapeDtypeStruct((rows, c), f.dtype) for f in cand],
    )
    if interpret:
        call_kwargs["interpret"] = True
    else:
        call_kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        )
    return pl.pallas_call(_make_compact_kernel(k, c, n_bits, nf), **call_kwargs)(s, *cand)
