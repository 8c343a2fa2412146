"""Pallas TPU kernel for the shift rebin's ±1-cell routing passes.

`cell_dense._rebin_shift` factorizes the incremental rebin into three axis
passes (the TPU re-imagining of the reference's `update_cells!` chain,
cells.jl:196-222).  As XLA ops each pass's log-shift compaction rounds do NOT
fuse on TPU: a lane-offset roll is a physical relayout (a standalone `slice`
pair per roll), so every round round-trips every transported field through
HBM.  A device profile at the 1M-atom config attributed 11.8 ms/rebin almost
entirely to those unfused rounds (376 slice ops + their selects per rebin).

Design (one `pallas_call` per axis pass):

- the transported fields ride ONE stacked (nf, M, M², C) int32 array (f32
  payloads bitcast at the XLA boundary — transport is selection-only and
  bit-exact), stacked once per rebin and unstacked once after the 3rd pass;
- grid (M, nf): per z-plane, the f==0 program computes the routing masks,
  MXU arrival ranks (mask @ strict-upper-triangular: exact integer prefix
  sums in bf16→f32), and the per-round arrive masks ONCE into VMEM scratch
  that persists across the plane's nf programs — each field then pays only
  its own window build + log-shift rounds, all in registers;
- slot validity travels IN-BAND: empty slots carry a NaN-pattern sentinel
  (0x7fc00000) in every position component, so no atom-id side channel is
  fetched (the epilogue's zero-fill restores 0.0, matching the XLA path);
- x/y passes read only their own plane (neighbor cells are ±1 / ±M row
  rolls with in-register periodic wrap fixes); the z pass reads the two
  neighbor planes via modular block index maps;
- the algorithm, candidate order, and select structure are IDENTICAL to
  `cell_dense._route_axis_pass` (no-spill path), so the output state is
  bit-for-bit the XLA engine's — gated by a differential test.

Like the force kernels (pallas_cell_kernel.py), this replaces what the
reference does with linked-list splices and shared-memory merges
(cells.jl:62-174) — pointer-chasing XLA cannot express — with dense,
deterministic lane transport.

Spill/squeeze configs (`config.spill`) keep the XLA path: boundary-spill
balancing couples cells two apart and is off on every production config.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Canonical quiet-NaN bit pattern: parks empty slots' position components.
# A real coordinate is never NaN (guard_energy would have tripped long
# before), so the sentinel is unambiguous in-band validity.
SENTINEL_BITS = 0x7FC00000


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _make_pass_kernel(axis: int, m: int, c: int, nf: int, num_slots: int):
    """One routing pass: axis 0 = grid-z (coordinate field 2), 1 = grid-y
    (field 1), 2 = grid-x (field 0) — `_rebin_shift`'s pass order."""
    k = 3 * c
    kp = _round_up(k, 128)
    rows = m * m
    n_bits = max(1, int(np.ceil(np.log2(k))))
    n_views = 3 if axis == 0 else 1
    i8 = jnp.int8

    def row_coord(which: str):
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        return (r % m) if which == "x" else (r // m)

    def nbr_rows(a, delta):
        """Within-plane neighbor content for the x/y passes: cell (b+δ)'s
        row, periodic in this pass's axis.  axis 2 (x): ±1 rows with wrap
        every M rows; axis 1 (y): ±M rows with wrap at the plane edge."""
        step = 1 if axis == 2 else m
        main = jnp.roll(a, -delta * step, axis=0)
        wrap = jnp.roll(a, delta * step * (m - 1), axis=0)
        b = row_coord("x" if axis == 2 else "y")
        at_edge = b == (m - 1 if delta > 0 else 0)
        return jnp.where(at_edge, wrap, main)

    def kernel(box_ref, triu_ref, *refs):
        if n_views == 3:
            (own, own_p, own_m, crd, crd_p, crd_m,
             out_ref, ovf_ref, arrive_ref, counts_ref) = refs
        else:
            (own, crd, out_ref, ovf_ref, arrive_ref, counts_ref) = refs
        z = pl.program_id(0)
        f = pl.program_id(1)
        box = box_ref[0, 0]
        mf = jnp.float32(m)

        def masks_of(crd_bits, b):
            valid = crd_bits != SENTINEL_BITS
            coord = pltpu.bitcast(crd_bits, jnp.float32)
            scaled = coord / box
            t = jnp.clip(
                jnp.floor(mf * (scaled - jnp.floor(scaled))).astype(jnp.int32),
                0, m - 1,
            )
            d = jnp.where(valid, jax.lax.rem((t - b) + m, m), 0)
            legal = (d == 0) | (d == 1) | (d == m - 1)
            bad = jnp.sum((valid & ~legal).astype(jnp.int32))
            g_minus = (valid & (d == m - 1)).astype(i8)
            g_stay = (valid & (d == 0)).astype(i8)
            g_plus = (valid & (d == 1)).astype(i8)
            return g_minus, g_stay, g_plus, bad

        @pl.when(f == 0)
        def _prepare():
            if axis == 0:
                _, _, gp_l, _ = masks_of(crd_m[0, 0], jax.lax.rem(z - 1 + m, m))
                _, gs_o, _, bad = masks_of(crd[0, 0], z)
                gm_r, _, _, _ = masks_of(crd_p[0, 0], jax.lax.rem(z + 1, m))
                w_left, w_stay, w_right = gp_l, gs_o, gm_r
            else:
                b = row_coord("x" if axis == 2 else "y")
                gm_o, gs_o, gp_o, bad = masks_of(crd[0, 0], b)
                w_left = nbr_rows(gp_o, -1)
                w_stay = gs_o
                w_right = nbr_rows(gm_o, +1)

            zero_tail = jnp.zeros((rows, kp - k), i8)
            wm = jnp.concatenate([w_left, w_stay, w_right, zero_tail], axis=1)

            # Arrival ranks on the MXU — exact integer prefix sums.
            rank = jax.lax.dot_general(
                wm.astype(jnp.bfloat16), triu_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            counts = jnp.sum(wm.astype(jnp.int32), axis=1, keepdims=True)
            counts_ref[...] = counts
            overflow = (bad > 0) | (jnp.max(counts) > c)
            ovf_ref[z, 0] = overflow.astype(jnp.int32)

            # Shift distances + per-round arrive masks, computed once and
            # reused by every field of this plane.
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows, kp), 1)
            s = jnp.where(wm != 0, lane - rank, 0)
            for j in range(n_bits):
                sh = 1 << j
                mv = s & sh  # int32 0/sh — Mosaic cannot roll i1 vregs
                arrive = (jnp.roll(mv, -sh, axis=1) != 0) & (lane < k - sh)
                arrive_ref[j] = arrive.astype(i8)
                s = jnp.where(arrive, jnp.roll(s, -sh, axis=1) - sh, s)
                s = jnp.where((mv != 0) & ~arrive, 0, s)

        # --- transport this field's plane ---
        fo = own[0, 0]
        if n_views == 3:
            fl, fr = own_m[0, 0], own_p[0, 0]
        else:
            fl = nbr_rows(fo, -1)
            fr = nbr_rows(fo, +1)
        ftail = jnp.zeros((rows, kp - k), jnp.int32)
        w = jnp.concatenate([fl, fo, fr, ftail], axis=1)
        for j in range(n_bits):
            arr = arrive_ref[j] != 0
            w = jnp.where(arr, jnp.roll(w, -(1 << j), axis=1), w)
        slot_lane = jax.lax.broadcasted_iota(jnp.int32, (rows, c), 1)
        valid_out = slot_lane < counts_ref[...]
        # Per-field invalid fill: position components get the sentinel,
        # atom_id its num_slots sentinel, everything else zero bits.
        fill = jnp.where(
            f < 3, jnp.int32(SENTINEL_BITS),
            jnp.where(f == nf - 1, jnp.int32(num_slots), 0)
        )
        out_ref[0, 0] = jnp.where(valid_out, w[:, :c], fill)

    return kernel, rows, kp, n_bits, n_views


def _triu(kp: int):
    # Built per trace (a jit-level constant; caching jnp arrays across traces
    # would leak tracers).
    return jnp.asarray(np.triu(np.ones((kp, kp), np.float32), 1), jnp.bfloat16)


def _one_pass(x, box_arr, axis, cf, m, c, nf, num_slots, interpret):
    kernel, rows, kp, n_bits, n_views = _make_pass_kernel(
        axis, m, c, nf, num_slots
    )
    blk = (1, 1, rows, c)

    def at(fi, dz):
        if dz == 0:
            return lambda z, f: (fi if fi is not None else f, z, 0, 0)
        return lambda z, f, dz=dz: (
            fi if fi is not None else f, jax.lax.rem(z + dz + m, m), 0, 0
        )

    field_specs = [pl.BlockSpec(blk, at(None, 0), memory_space=pltpu.VMEM)]
    if n_views == 3:
        field_specs += [
            pl.BlockSpec(blk, at(None, +1), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, at(None, -1), memory_space=pltpu.VMEM),
        ]
    coord_specs = [pl.BlockSpec(blk, at(cf, 0), memory_space=pltpu.VMEM)]
    if n_views == 3:
        coord_specs += [
            pl.BlockSpec(blk, at(cf, +1), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, at(cf, -1), memory_space=pltpu.VMEM),
        ]

    call = pl.pallas_call(
        kernel,
        grid=(m, nf),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # box
            pl.BlockSpec(memory_space=pltpu.VMEM),  # triu
        ] + field_specs + coord_specs,
        out_specs=[
            pl.BlockSpec(blk, at(None, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nf, m, rows, c), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_bits, rows, kp), jnp.int8),  # arrive masks
            pltpu.VMEM((rows, 1), jnp.int32),          # counts
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    xs = [x] * len(field_specs) + [x] * len(coord_specs)
    out, ovf = call(box_arr, _triu(kp), *xs)
    return out, jnp.any(ovf > 0)


@partial(jax.jit, static_argnames=("m", "c", "num_slots", "interpret"))
def rebin_routing_pallas(
    fields: tuple,
    box,
    m: int,
    c: int,
    num_slots: int,
    interpret: bool = False,
):
    """All three ±1-cell routing passes (z, then y, then x) on TPU.

    fields: tuple of (M³, C) arrays in `_rebin_shift`'s canonical order —
    position x/y/z first (these carry the NaN-pattern validity sentinel in
    their empty slots), the int32 atom_id LAST.  Returns (out_fields,
    overflow_flag) with the same slot assignment, bit-for-bit, as the XLA
    `_route_axis_pass` rounds on the no-spill path.
    """
    nf = len(fields)
    rows = m * m
    box_arr = jnp.asarray(box, jnp.float32).reshape(1, 1)
    cast = [
        (jax.lax.bitcast_convert_type(f, jnp.int32)
         if f.dtype == jnp.float32 else f.astype(jnp.int32))
        for f in fields
    ]
    x = jnp.stack(cast).reshape(nf, m, rows, c)
    ovf = jnp.asarray(False)
    for axis, cf in ((0, 2), (1, 1), (2, 0)):
        x, o = _one_pass(x, box_arr, axis, cf, m, c, nf, num_slots, interpret)
        ovf = ovf | o
    x = x.reshape(nf, m * rows, c)
    res = []
    for i, f in enumerate(fields):
        o = x[i]
        if f.dtype == jnp.float32:
            o = jax.lax.bitcast_convert_type(o, jnp.float32)
        res.append(o)
    return tuple(res), ovf


# ---------------------------------------------------------------------------
# Sharded (per-axis, pre-built-window) variant — the shard_map rebin path
# ---------------------------------------------------------------------------
#
# Under shard_map each routing pass's ±1-cell candidate content crosses shard
# edges (delivered by grid_sharded's per-axis ppermute splice), so the
# periodic in-kernel rolls above don't apply.  This variant takes the three
# candidate views PRE-BUILT (own / left-neighbor / right-neighbor cell
# content, any axis) plus the cells' GLOBAL coordinate along the pass axis,
# and runs the mask/rank/log-shift rounds in VMEM — the part that cost
# 11.8 ms/rebin as XLA ops at 1M atoms.  One pallas_call per pass; the
# caller re-exchanges windows between passes (content changes each pass).


def _make_window_pass_kernel(m_global: int, rows: int, c: int, nf: int, num_slots: int):
    k = 3 * c
    kp = _round_up(k, 128)
    n_bits = max(1, int(np.ceil(np.log2(k))))
    i8 = jnp.int8

    def kernel(box_ref, triu_ref, b_ref, own, wl, wr, crd, crd_l, crd_r,
               out_ref, ovf_ref, arrive_ref, counts_ref):
        p = pl.program_id(0)
        f = pl.program_id(1)
        box = box_ref[0, 0]
        mf = jnp.float32(m_global)
        b = b_ref[0][:, 0:1]  # (rows, 1) global coordinate of each cell

        def masks_of(crd_bits, bcol):
            valid = crd_bits != SENTINEL_BITS
            coord = pltpu.bitcast(crd_bits, jnp.float32)
            scaled = coord / box
            t = jnp.clip(
                jnp.floor(mf * (scaled - jnp.floor(scaled))).astype(jnp.int32),
                0, m_global - 1,
            )
            d = jnp.where(valid, jax.lax.rem((t - bcol) + m_global, m_global), 0)
            legal = (d == 0) | (d == 1) | (d == m_global - 1)
            bad = jnp.sum((valid & ~legal).astype(jnp.int32))
            g_minus = (valid & (d == m_global - 1)).astype(i8)
            g_stay = (valid & (d == 0)).astype(i8)
            g_plus = (valid & (d == 1)).astype(i8)
            return g_minus, g_stay, g_plus, bad

        @pl.when(f == 0)
        def _prepare():
            # Candidates of dest cell b: [b−1's +movers, b's stayers,
            # b+1's −movers] — the window arrays hold the NEIGHBOR CELLS'
            # content, so their masks are evaluated at b∓1.
            bm = jax.lax.rem(b - 1 + m_global, m_global)
            bp = jax.lax.rem(b + 1, m_global)
            _, _, gp_l, _ = masks_of(crd_l[0, 0], bm)
            _, gs_o, _, bad = masks_of(crd[0, 0], b)
            gm_r, _, _, _ = masks_of(crd_r[0, 0], bp)
            zero_tail = jnp.zeros((rows, kp - k), i8)
            wm = jnp.concatenate([gp_l, gs_o, gm_r, zero_tail], axis=1)
            rank = jax.lax.dot_general(
                wm.astype(jnp.bfloat16), triu_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            counts = jnp.sum(wm.astype(jnp.int32), axis=1, keepdims=True)
            counts_ref[...] = counts
            overflow = (bad > 0) | (jnp.max(counts) > c)
            ovf_ref[p, 0] = overflow.astype(jnp.int32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows, kp), 1)
            s = jnp.where(wm != 0, lane - rank, 0)
            for j in range(n_bits):
                sh = 1 << j
                mv = s & sh
                arrive = (jnp.roll(mv, -sh, axis=1) != 0) & (lane < k - sh)
                arrive_ref[j] = arrive.astype(i8)
                s = jnp.where(arrive, jnp.roll(s, -sh, axis=1) - sh, s)
                s = jnp.where((mv != 0) & ~arrive, 0, s)

        ftail = jnp.zeros((rows, kp - k), jnp.int32)
        w = jnp.concatenate([wl[0, 0], own[0, 0], wr[0, 0], ftail], axis=1)
        for j in range(n_bits):
            arr = arrive_ref[j] != 0
            w = jnp.where(arr, jnp.roll(w, -(1 << j), axis=1), w)
        slot_lane = jax.lax.broadcasted_iota(jnp.int32, (rows, c), 1)
        valid_out = slot_lane < counts_ref[...]
        fill = jnp.where(
            f < 3, jnp.int32(SENTINEL_BITS),
            jnp.where(f == nf - 1, jnp.int32(num_slots), 0)
        )
        out_ref[0, 0] = jnp.where(valid_out, w[:, :c], fill)

    return kernel, kp, n_bits


def rebin_window_pass_pallas(
    x, win_left, win_right, b, box, cf: int, m_global: int, c: int,
    num_slots: int, planes: int, interpret: bool = False,
):
    """One routing pass over pre-built candidate windows.

    x / win_left / win_right: (nf, planes, rows, c) int32 (f32 payloads
    bitcast; coords carry the NaN sentinel in empty slots); b: (planes,
    rows, 1) int32 GLOBAL cell coordinate along the pass axis; cf the
    position-component field index this pass bins on (x=0, y=1, z=2);
    m_global the global cell count on that axis.  Returns (x_out,
    overflow)."""
    nf, _, rows, _ = x.shape
    kernel, kp, n_bits = _make_window_pass_kernel(m_global, rows, c, nf, num_slots)
    blk = (1, 1, rows, c)
    at_pf = lambda p, f: (f, p, 0, 0)
    at_cf = lambda p, f, cf=cf: (cf, p, 0, 0)
    call = pl.pallas_call(
        kernel,
        grid=(planes, nf),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # box
            pl.BlockSpec(memory_space=pltpu.VMEM),  # triu
            pl.BlockSpec((1, rows, 1), lambda p, f: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, at_pf, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, at_pf, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, at_pf, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, at_cf, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, at_cf, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, at_cf, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, at_pf, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nf, planes, rows, c), jnp.int32),
            jax.ShapeDtypeStruct((planes, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_bits, rows, kp), jnp.int8),
            pltpu.VMEM((rows, 1), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    box_arr = jnp.asarray(box, jnp.float32).reshape(1, 1)
    out, ovf = call(
        box_arr, _triu(kp), b, x, win_left, win_right, x, win_left, win_right
    )
    return out, jnp.any(ovf > 0)
