"""C-tight straggler engine: slot capacity at the occupancy mean, with the
equilibrium tail parked in a tiny auxiliary buffer.

Pair work in the dense-cell engine scales as capacity² while the MEAN
occupancy at the 100k benchmark is 19.9 — a C=32 (mean+2.5σ) grid evaluates
(32/30)²–(32/24)² more candidate pairs than the atoms need.  The r2–r4
attempts to close that gap (spill balancing, squeeze, asymmetric kernels —
docs/PERF.md "The C=24 campaign") all failed on one fact: the occupancy tail
REGENERATES between rebins, so a strictly tight grid always drops atoms.

This engine makes the tight grid SAFE instead of trying to empty the tail:

- the state grid stores C_t atoms/cell (measured cost is near-LINEAR in
  C_t, not vreg-class-quantized: force pass −0.13 ms at C_t=28 vs C=32 at
  the 100k benchmark, where the tail is 8.4 atoms mean / 30 max —
  docs/PERF.md r5);
- atoms beyond C_t park in a fixed (A,) auxiliary buffer ("stragglers"),
  assigned at rebin time, sticky-flagged if A ever overflows;
- the force kernel pairs each pencil row's center atoms against the ≤Kn
  stragglers parked in the row's 9-hood (pallas_cell_kernel.py `strag_kn`) —
  straggler↔grid pairs are OWNED by that tile (the straggler is never in the
  grid, so no double counting), straggler↔straggler pairs by a tiny XLA
  all-pairs pass, grid↔grid pairs by the unchanged half-shell main pass;
- the rebin runs the standard ±1-cell routing at a WIDE capacity C_w: pad
  the C_t grid with C_w−C_t empty slot columns, scatter the aux atoms into
  their parked cells' pad slots (rank recorded at park time), route
  (`_rebin_shift_core` — the Pallas rebin kernel applies unchanged), then
  split: columns < C_t stay in the grid, the rest re-park.

Uniform-LJ NVE only (the throughput benchmark shape): energies/virials and
any richer physics go through the wide-state XLA path (`energy` rebuilds the
C_w grid and runs `cell_dense_forces` — every pair counted by the existing
engine).  Reference match: this replaces the same all-pairs CUDA kernel
(nonbonded.jl:44-107) as the dense engine, at the BASELINE.json north-star
scale the reference never reached.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from emdee_tpu.core.types import LJParams
from emdee_tpu.neighbors.cell_dense import (
    CellDenseConfig,
    CellDenseState,
    _rebin_shift_core,
    cell_dense_forces,
    cell_dense_init,
    suggest_cell_dense_config,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, pair_interaction


class StragglerConfig(NamedTuple):
    """Static geometry of the straggler engine."""

    grid: CellDenseConfig  # capacity = C_t (the kernel capacity)
    wide_capacity: int  # C_w: rebin routing capacity (> C_t)
    aux_capacity: int  # A: straggler buffer slots
    kn: int  # per-pencil-row 9-hood straggler list width

    @property
    def wide(self) -> CellDenseConfig:
        return self.grid._replace(capacity=self.wide_capacity)

    @property
    def sentinel(self) -> int:
        # ONE atom-id sentinel for both capacities (the wide one bounds it).
        return self.wide.num_slots


def suggest_straggler_config(
    num_atoms: int,
    box: float,
    cutoff: float,
    switch: float,
    skin: float = 0.35,
    tight_capacity: Optional[int] = None,
    wide_capacity: Optional[int] = None,
    aux_capacity: int = 128,
    kn: int = 16,
) -> StragglerConfig:
    """Tight-capacity config.  C_t defaults 4 below the mean+2.5σ capacity —
    the measured sweet spot at the 100k benchmark (tail 8.4 atoms mean /
    30 max, handled by A=64 at ~0.05 ms/step; one step tighter at C_t=26
    grows the tail to 58/164 and the handling cost eats the capacity win —
    docs/PERF.md r5)."""
    base = suggest_cell_dense_config(num_atoms, box, cutoff, switch, skin)
    if tight_capacity is None:
        tight_capacity = base.capacity - 4
    if wide_capacity is None:
        wide_capacity = -(-(tight_capacity + 10) // 8) * 8
    return StragglerConfig(
        grid=base._replace(capacity=tight_capacity),
        wide_capacity=wide_capacity,
        aux_capacity=aux_capacity,
        kn=kn,
    )


class StragglerState(NamedTuple):
    grid: CellDenseState  # slot grid at C_t (atom-id sentinel = config.sentinel)
    aux_positions: jax.Array  # (A, 3)
    aux_velocities: jax.Array  # (A, 3)
    aux_atom_id: jax.Array  # (A,) int32, sentinel for empty
    aux_cell: jax.Array  # (A,) int32 parked cell, M³ for empty
    aux_rank: jax.Array  # (A,) int32 pad-slot rank within the parked cell


def straggler_init(
    positions, velocities, masses, params: LJParams, config: StragglerConfig
) -> StragglerState:
    """Host entry: bin at the WIDE capacity, then split grid/tail."""
    cfg_w = config.wide
    st_w = cell_dense_init(positions, velocities, masses, params, cfg_w)
    c_t, c_w, a_cap = config.grid.capacity, config.wide_capacity, config.aux_capacity
    nc = config.grid.num_cells
    sent = config.sentinel
    valid = np.asarray(st_w.valid)
    tailv = valid[:, c_t:]
    cells, ranks = np.nonzero(tailv)
    count = len(cells)
    overflow = bool(st_w.overflow) or count > a_cap

    def pack(arr, fill=0.0):
        a = np.asarray(arr)
        out = np.full((a_cap,) + a.shape[2:], fill, a.dtype)
        out[: min(count, a_cap)] = a[cells, c_t + ranks][:a_cap]
        return jnp.asarray(out)

    cut = lambda a: a[:, :c_t]
    grid = CellDenseState(
        positions=cut(st_w.positions),
        velocities=cut(st_w.velocities),
        inv_masses=cut(st_w.inv_masses),
        half_sigma=cut(st_w.half_sigma),
        twice_sqrt_eps=cut(st_w.twice_sqrt_eps),
        atom_id=cut(st_w.atom_id),
        valid=cut(st_w.valid),
        ref_positions=cut(st_w.ref_positions),
        step=st_w.step,
        overflow=jnp.asarray(overflow),
        charges=None,
    )
    acell = np.full(a_cap, nc, np.int32)
    arank = np.zeros(a_cap, np.int32)
    acell[: min(count, a_cap)] = cells[:a_cap]
    arank[: min(count, a_cap)] = ranks[:a_cap]
    return StragglerState(
        grid=grid,
        aux_positions=pack(st_w.positions),
        aux_velocities=pack(st_w.velocities),
        aux_atom_id=pack(st_w.atom_id, fill=sent),
        aux_cell=jnp.asarray(acell),
        aux_rank=jnp.asarray(arank),
    )


def _hood_matrix(m: int) -> np.ndarray:
    """(M², M²) 0/1: H[r, r'] = 1 iff pencil row r' is in r's wrapped 9-hood."""
    rows = np.arange(m * m)
    rz, ry = rows // m, rows % m
    h = np.zeros((m * m, m * m), np.float32)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            r2 = ((rz + dz) % m) * m + (ry + dy) % m
            h[rows, r2] = 1.0
    return h


def _split3(t):
    """Exact 3-term bf16 split of an f32 array (8+8+8 mantissa bits)."""
    hi = t.astype(jnp.bfloat16)
    rem = t - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _bindings(acell, avalid, config: StragglerConfig, hood):
    """Per-rebin straggler bindings: the (M², Kn, A) one-hot list matrix O
    (row r's k-th listed straggler), the (M², 1, Kn) validity mask, and the
    Kn-overflow flag.  O is exact 0/1 in bf16; `O @ split3(values)` is a
    bit-exact gather (each output sums exactly one nonzero term), and the
    transposed contraction folds per-row reaction sums back to aux atoms."""
    m = config.grid.cells_per_dim
    kn = config.kn
    arow = jnp.where(avalid, acell // m, 0)
    p = (
        (arow[:, None] == jnp.arange(m * m, dtype=jnp.int32)[None, :])
        & avalid[:, None]
    )  # (A, M²)
    r = jnp.dot(
        hood, p.astype(jnp.float32).T, preferred_element_type=jnp.float32
    )  # (M², A) ∈ {0,1} — each straggler's parked row hits 9 DISTINCT rows
    rank = jnp.cumsum(r, axis=1) - r
    counts = jnp.sum(r, axis=1)
    kn_overflow = jnp.max(counts) > kn
    o = (
        (rank[:, None, :] == jnp.arange(kn, dtype=jnp.float32)[None, :, None])
        & (r[:, None, :] > 0)
    )
    o_bf = o.astype(jnp.bfloat16)  # (M², Kn, A)
    sm = jnp.sum(o.astype(jnp.float32), axis=2)  # (M², Kn)
    mkn = -(-(m * kn) // 128) * 128
    smask = jnp.pad(
        jnp.tile(sm[:, None, :], (1, 1, m)),  # (M², 1, M·Kn), pad lanes 0
        ((0, 0), (0, 0), (0, mkn - m * kn)),
    )
    return o_bf, smask, kn_overflow


def _build_strag_rows(o_bf, ax, ay, az, m):
    """(A,) aux coordinates → (M², 1, M·Kn) kernel list rows (bit-exact),
    pre-tiled across the M lane groups (the kernel reads them as-is — an
    in-kernel repeat hit a Mosaic layout error)."""
    stack = jnp.stack([ax, ay, az], axis=0)  # (3, A)
    hi, mid, lo = _split3(stack)
    f = lambda u: jax.lax.dot_general(
        o_bf, u, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (M², Kn, 3)
    t = f(hi) + f(mid) + f(lo)
    mkn = -(-(m * t.shape[1]) // 128) * 128
    pad = mkn - m * t.shape[1]

    def tile(a):  # (M², Kn) → (M², 1, M·Kn_pad): tiled across lane groups
        out = jnp.tile(a[:, None, :], (1, 1, m))
        return jnp.pad(out, ((0, 0), (0, 0), (0, pad)))

    return tile(t[:, :, 0]), tile(t[:, :, 1]), tile(t[:, :, 2])


def _fold_strag_react(o_bf, sro, m: int, kn: int):
    """(M², 3, M·Kn_pad) per-program reaction rows → (3, A) aux forces."""
    t = sro[:, :, : m * kn].reshape(m * m, 3, m, kn).sum(axis=2)  # (M², 3, Kn)
    hi, mid, lo = _split3(t)

    def term(u):  # contract the (M², Kn) axes against O → (3, A)
        return jax.lax.dot_general(
            u.transpose(1, 0, 2).reshape(3, -1),
            o_bf.reshape(-1, o_bf.shape[-1]),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return term(hi) + term(mid) + term(lo)


def _aux_pair_forces(ax, ay, az, avalid, model: LennardJonesModel, box, uniform_params):
    """Straggler↔straggler LJ forces: tiny all-pairs (A ≲ 128)."""
    hs, tse = uniform_params
    dvx = ax[:, None] - ax[None, :]
    dvy = ay[:, None] - ay[None, :]
    dvz = az[:, None] - az[None, :]
    mi = lambda d: d - jnp.round(d / box) * box
    dvx, dvy, dvz = mi(dvx), mi(dvy), mi(dvz)
    r2 = dvx * dvx + dvy * dvy + dvz * dvz
    a = ax.shape[0]
    eye = jnp.eye(a, dtype=bool)
    ok = avalid[:, None] & avalid[None, :] & ~eye
    r2s = jnp.where(ok, r2, 1.0)
    _, mre = pair_interaction(
        r2s, model, jnp.float32(hs), jnp.float32(tse), jnp.float32(hs), jnp.float32(tse)
    )
    g = jnp.where(ok, mre / r2s, 0.0)
    return (
        jnp.sum(g * dvx, axis=1),
        jnp.sum(g * dvy, axis=1),
        jnp.sum(g * dvz, axis=1),
    )


def _widen_fields(gfields, aux_fields, acell, arank, avalid, config):
    """Pad the C_t grid to C_w and insert the aux atoms into their parked
    cells' pad slots (scatter of A rows — the rank was recorded at park
    time, so destinations are collision-free)."""
    c_t, c_w = config.grid.capacity, config.wide_capacity
    nc = config.grid.num_cells
    sent = config.sentinel
    dest = jnp.where(avalid, acell * c_w + c_t + arank, nc * c_w)
    out = []
    for fg, fa in zip(gfields, aux_fields):
        fill = sent if fg.dtype == jnp.int32 else 0
        w = jnp.pad(fg, ((0, 0), (0, c_w - c_t)), constant_values=fill)
        w = w.reshape(-1).at[dest].set(fa, mode="drop").reshape(nc, c_w)
        out.append(w)
    return out


def _nbr27_table(acell, avalid, m: int, nc: int):
    """(A, 27) wrapped neighbor-cell ids of each straggler's parked cell
    (invalid aux → the nc sentinel row, masked downstream)."""
    z = acell // (m * m)
    y = (acell // m) % m
    x = acell % m
    offs = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    cols = []
    for dz, dy, dx in offs:
        cols.append(
            ((x + dx) % m) + m * (((y + dy) % m) + m * ((z + dz) % m))
        )
    tab = jnp.stack(cols, axis=1)
    return jnp.where(avalid[:, None], tab, nc)


def make_straggler_sim(
    config: StragglerConfig,
    model: LennardJonesModel,
    dt: float,
    uniform_params,
    uniform_mass: float = 1.0,
    backend: str = "auto",
    strag_pass: str = "auto",
):
    """Build (rollout, energy) for uniform-LJ NVE on the straggler engine.

    rollout(state, num_steps, rebin_every) → StragglerState — leapfrog NVE
    on the component carry (grid + aux), rebinning through the wide-capacity
    routing every `rebin_every` steps.  energy(state) → (pe, vir, ke) via
    the wide-state XLA path."""
    from emdee_tpu.neighbors.pallas_cell_kernel import (
        _const_tiles,
        _fold_ghosts,
        _ghost,
        _sentinel_far,
        halfshell_call,
    )

    if backend == "auto":
        backend = (
            "pallas" if jax.default_backend() in ("tpu", "axon") else "pallas_interpret"
        )
    if backend not in (
        "pallas", "pallas_interpret",
        "pallas_streaming", "pallas_streaming_interpret",
    ):
        raise ValueError(
            "straggler engine runs the Pallas force kernels only "
            f"(got backend={backend!r})"
        )
    streaming = backend in ("pallas_streaming", "pallas_streaming_interpret")
    interp = backend in ("pallas_interpret", "pallas_streaming_interpret")
    if strag_pass == "auto":
        strag_pass = "kernel" if backend == "pallas_interpret" else "xla"
    if strag_pass not in ("kernel", "xla"):
        raise ValueError(f"strag_pass must be 'kernel' or 'xla', got {strag_pass!r}")
    if streaming and strag_pass == "kernel":
        # The streaming kernel has no straggler tile — its grid pass streams
        # pencil rows from HBM and the 9-hood list rows would have to stream
        # with them; the XLA gather pass is the straggler path at scale.
        raise ValueError("strag_pass='kernel' requires the resident kernel")
    if strag_pass == "kernel" and not interp:
        # The in-kernel 9-hood tile computes WRONG forces when Mosaic-
        # compiled (measured 0.30 max-rel on v5e even with 128-padded lanes,
        # while interpret mode matches the wide engine to roundoff — a
        # Mosaic layout bug around the (1, M·Kn) broadcast tile).  Until
        # that is root-caused, real-TPU runs take the XLA 27-row-gather
        # pass, which is also FASTER at production tail sizes (A ≲ 64:
        # 1.164 vs 1.276 ms/step at the 100k benchmark — docs/PERF.md r5).
        raise ValueError(
            "strag_pass='kernel' is interpret-only (Mosaic miscompiles the "
            "straggler tile on real TPUs); use strag_pass='xla' or 'auto'"
        )
    # The rebin routing kernel is independent of the force-kernel choice.
    rebin_backend = "pallas_interpret" if interp else "pallas"
    cfg_t = config.grid
    cfg_w = config.wide
    m, c_t = cfg_t.cells_per_dim, cfg_t.capacity
    c_w = config.wide_capacity
    kn = config.kn
    nc = cfg_t.num_cells
    sent = config.sentinel
    a_cap = config.aux_capacity
    g = m + 2
    dt_f = jnp.float32(dt)
    kick_dt = dt_f * jnp.float32(1.0 / uniform_mass)
    half_dt = 0.5 * dt_f * jnp.float32(1.0 / uniform_mass)
    sbox = jnp.float32(cfg_t.box)
    hood = jnp.asarray(_hood_matrix(m))
    if config.grid.spill:
        raise ValueError("straggler engine replaces spill mode — use spill=False")

    def bindings(acell, avalid, valid):
        """Per-rebin straggler bindings for the selected pass + Kn flag.
        `valid` is the post-rebin grid mask — fixed for the block, so the
        XLA pass's candidate-validity gather happens once per rebin."""
        if strag_pass == "kernel":
            o_bf, smask, knovf = _bindings(acell, avalid, config, hood)
            return (o_bf, smask), knovf
        tab = _nbr27_table(acell, avalid, m, nc)
        idx = jnp.minimum(tab.reshape(-1), nc - 1)
        mask = (
            valid.astype(jnp.float32)[idx].reshape(a_cap, 27 * c_t)
            * avalid.astype(jnp.float32)[:, None]
        )
        return (idx, mask), jnp.asarray(False)

    def _grid_forces_resident(px, py, pz, valid, strag=None):
        """VMEM-resident kernel on the C_t grid (optionally with the
        in-kernel straggler tile) — ghosts/centers built XLA-side."""
        far = _sentinel_far(cfg_t)
        sx = jnp.where(valid, px, far)
        sy = jnp.where(valid, py, far)
        sz = jnp.where(valid, pz, far)
        grid4 = lambda a: a.reshape(m, m, m, c_t)
        gx = _ghost(grid4(sx), m, axis_shift=2, box=sbox).reshape(g * g, g * c_t)
        gy = _ghost(grid4(sy), m, axis_shift=1, box=sbox).reshape(g * g, g * c_t)
        gz = _ghost(grid4(sz), m, axis_shift=0, box=sbox).reshape(g * g, g * c_t)

        def center(a):
            return a.reshape(m * m, m, c_t).transpose(0, 2, 1)

        def uncenter(a):
            return a.transpose(0, 2, 1).reshape(nc, c_t)

        cen_fields = [center(sx), center(sy), center(sz)]
        if strag is not None:
            sgx, sgy, sgz, smask = strag
            centers = jnp.concatenate(
                cen_fields + [center(valid.astype(jnp.float32))], axis=1
            )
            outs = halfshell_call(
                (gx, gy, gz, centers) + _const_tiles(m, c_t), cfg_t, (m, m, m),
                interpret=interp, uniform_params=uniform_params,
                strag_inputs=(sgx, sgy, sgz, smask), strag_kn=kn,
            )
            fx_c, fy_c, fz_c, react, sro = outs
        else:
            centers = jnp.concatenate(cen_fields, axis=1)
            outs = halfshell_call(
                (gx, gy, gz, centers) + _const_tiles(m, c_t), cfg_t, (m, m, m),
                interpret=interp, uniform_params=uniform_params,
            )
            fx_c, fy_c, fz_c, react = outs
            sro = None
        react = react.reshape(3, g * g, g * c_t)
        fx = uncenter(fx_c) + _fold_ghosts(react[0], m, c_t)
        fy = uncenter(fy_c) + _fold_ghosts(react[1], m, c_t)
        fz = uncenter(fz_c) + _fold_ghosts(react[2], m, c_t)
        return fx, fy, fz, sro

    def forces(px, py, pz, valid, ax, ay, az, avalid, bind):
        if strag_pass == "kernel":
            o_bf, smask = bind
            sgx, sgy, sgz = _build_strag_rows(o_bf, ax, ay, az, m)
            fx, fy, fz, sro = _grid_forces_resident(
                px, py, pz, valid, strag=(sgx, sgy, sgz, smask)
            )
            af = _fold_strag_react(o_bf, sro, m, kn)  # (3, A)
            afx, afy, afz = af[0], af[1], af[2]
        else:
            # Pure-XLA straggler pass: each aux atom gathers its parked
            # cell's 27-hood rows (A·27 row gathers — cheap at A ≲ 128),
            # computes min-imaged uniform-LJ pairs, and scatter-adds the
            # reactions back.  No kernel involvement — the robust path on
            # hardware where the in-kernel tile trips Mosaic layouts.
            # The grid pass is the resident kernel, or the HBM-streaming
            # kernel when the grid outgrows VMEM (the 1M-atom shape).
            if streaming:
                from emdee_tpu.neighbors.pallas_cell_kernel import (
                    pallas_cell_forces_streaming_split,
                )

                fx, fy, fz = pallas_cell_forces_streaming_split(
                    px, py, pz, valid, cfg_t,
                    uniform_params=uniform_params, interpret=interp, box=sbox,
                )
            else:
                fx, fy, fz, _ = _grid_forces_resident(px, py, pz, valid)
            idx, mask = bind
            a27c = (a_cap, 27 * c_t)
            cxp = px[idx].reshape(a27c)
            cyp = py[idx].reshape(a27c)
            czp = pz[idx].reshape(a27c)
            mi = lambda d: d - jnp.round(d / sbox) * sbox
            dvx = mi(ax[:, None] - cxp)
            dvy = mi(ay[:, None] - cyp)
            dvz = mi(az[:, None] - czp)
            r2 = dvx * dvx + dvy * dvy + dvz * dvz + (1.0 - mask) * 1.0e8
            hs_u, tse_u = uniform_params
            _, mre = pair_interaction(
                r2, model, jnp.float32(hs_u), jnp.float32(tse_u),
                jnp.float32(hs_u), jnp.float32(tse_u),
            )
            gfac = mask * mre / r2
            gx_p = gfac * dvx
            gy_p = gfac * dvy
            gz_p = gfac * dvz
            afx = jnp.sum(gx_p, axis=1)
            afy = jnp.sum(gy_p, axis=1)
            afz = jnp.sum(gz_p, axis=1)
            rows = lambda t: -t.reshape(a_cap * 27, c_t)
            fx = fx.at[idx].add(rows(gx_p))
            fy = fy.at[idx].add(rows(gy_p))
            fz = fz.at[idx].add(rows(gz_p))
        ssx, ssy, ssz = _aux_pair_forces(
            ax, ay, az, avalid, model, sbox, uniform_params
        )
        return fx, fy, fz, afx + ssx, afy + ssy, afz + ssz

    def rebin(carry):
        (px, py, pz, vx, vy, vz, aid,
         ax, ay, az, avx, avy, avz, aaid, acell, arank, ovf) = carry
        avalid = acell < nc
        wf = _widen_fields(
            [px, py, pz, vx, vy, vz, aid],
            [ax, ay, az, avx, avy, avz, aaid],
            acell, arank, avalid, config,
        )
        valid_w = wf[6] < sent
        wf, valid_w, ovf = _rebin_shift_core(
            wf, valid_w, ovf, cfg_w, sbox, rebin_backend
        )
        zero = lambda a: jnp.where(valid_w[:, :c_t], a[:, :c_t], 0.0)
        px, py, pz = zero(wf[0]), zero(wf[1]), zero(wf[2])
        vx, vy, vz = zero(wf[3]), zero(wf[4]), zero(wf[5])
        aid = jnp.where(valid_w[:, :c_t], wf[6][:, :c_t], sent)
        # Re-park the tail: pack the ≤A occupied pad slots into the aux
        # buffer (ascending flat order — deterministic), record (cell, rank)
        # for the next insert, sticky-flag on A overflow.
        p_w = c_w - c_t
        tv = valid_w[:, c_t:].reshape(-1)
        order = jnp.argsort(jnp.where(tv, 0, 1), stable=True)[:a_cap].astype(jnp.int32)
        taken = tv[order]
        tf = lambda f: jnp.where(taken, f[:, c_t:].reshape(-1)[order], 0.0)
        ax, ay, az = tf(wf[0]), tf(wf[1]), tf(wf[2])
        avx, avy, avz = tf(wf[3]), tf(wf[4]), tf(wf[5])
        aaid = jnp.where(taken, wf[6][:, c_t:].reshape(-1)[order], sent)
        acell = jnp.where(taken, order // p_w, nc)
        arank = jnp.where(taken, order % p_w, 0)
        ovf = ovf | (jnp.sum(tv.astype(jnp.int32)) > a_cap)
        return (px, py, pz, vx, vy, vz, aid,
                ax, ay, az, avx, avy, avz, aaid, acell, arank, ovf)

    @partial(jax.jit, static_argnames=("num_steps", "rebin_every"))
    def rollout(state: StragglerState, num_steps: int, rebin_every: int = 6):
        blocks, rem = divmod(num_steps, rebin_every)
        gr = state.grid
        px, py, pz = (gr.positions[..., i] for i in range(3))
        vx, vy, vz = (gr.velocities[..., i] for i in range(3))
        aid = jnp.where(gr.valid, gr.atom_id, sent)
        ax, ay, az = (state.aux_positions[..., i] for i in range(3))
        avx, avy, avz = (state.aux_velocities[..., i] for i in range(3))
        aaid = state.aux_atom_id
        acell, arank = state.aux_cell, state.aux_rank
        ovf = gr.overflow

        # Initial half-kick with the CURRENT binding.
        bind0, knovf0 = bindings(acell, acell < nc, aid < sent)
        ovf = ovf | knovf0
        f0 = forces(px, py, pz, aid < sent, ax, ay, az, acell < nc, bind0)
        vx, vy, vz = vx + half_dt * f0[0], vy + half_dt * f0[1], vz + half_dt * f0[2]
        avx = avx + half_dt * f0[3]
        avy = avy + half_dt * f0[4]
        avz = avz + half_dt * f0[5]

        def lf_block(length):
            def block(carry, _):
                carry = rebin(carry)
                (px, py, pz, vx, vy, vz, aid,
                 ax, ay, az, avx, avy, avz, aaid, acell, arank, ovf) = carry
                valid = aid < sent
                avalid = acell < nc
                bind, knovf = bindings(acell, avalid, valid)
                ovf = ovf | knovf
                rx, ry, rz = px, py, pz
                arx, ary, arz = ax, ay, az

                def comp_add(p, dp, c):
                    # Kahan-compensated drift/kick (cell_dense.py's
                    # leapfrog does the same): the dt·v increment is ~1e-4
                    # of the coordinate, so plain += loses ~1 ulp/step —
                    # the dominant NVE drift term; the kicks walk the same
                    # way.  Compensation lives only within a block.
                    y = dp - c
                    t = p + y
                    return t, (t - p) - y

                def lf_step(s, _):
                    (px, py, pz, vx, vy, vz, ax, ay, az, avx, avy, avz,
                     cx, cy, cz, acx, acy, acz,
                     wx, wy, wz, awx, awy, awz) = s
                    px, cx = comp_add(px, dt_f * vx, cx)
                    py, cy = comp_add(py, dt_f * vy, cy)
                    pz, cz = comp_add(pz, dt_f * vz, cz)
                    ax, acx = comp_add(ax, dt_f * avx, acx)
                    ay, acy = comp_add(ay, dt_f * avy, acy)
                    az, acz = comp_add(az, dt_f * avz, acz)
                    fx, fy, fz, afx, afy, afz = forces(
                        px, py, pz, valid, ax, ay, az, avalid, bind
                    )
                    vx, wx = comp_add(vx, kick_dt * fx, wx)
                    vy, wy = comp_add(vy, kick_dt * fy, wy)
                    vz, wz = comp_add(vz, kick_dt * fz, wz)
                    avx, awx = comp_add(avx, kick_dt * afx, awx)
                    avy, awy = comp_add(avy, kick_dt * afy, awy)
                    avz, awz = comp_add(avz, kick_dt * afz, awz)
                    return (
                        px, py, pz, vx, vy, vz,
                        ax, ay, az, avx, avy, avz,
                        cx, cy, cz, acx, acy, acz,
                        wx, wy, wz, awx, awy, awz,
                    ), None

                zg = jnp.zeros_like(px)
                za = jnp.zeros_like(ax)
                (px, py, pz, vx, vy, vz, ax, ay, az, avx, avy, avz,
                 *_), _ = jax.lax.scan(
                    lf_step,
                    (px, py, pz, vx, vy, vz, ax, ay, az, avx, avy, avz,
                     zg, zg, zg, za, za, za, zg, zg, zg, za, za, za),
                    None, length=length,
                )
                mi = lambda d: d - jnp.round(d / sbox) * sbox
                d2 = jnp.where(
                    valid,
                    mi(px - rx) ** 2 + mi(py - ry) ** 2 + mi(pz - rz) ** 2,
                    0.0,
                )
                a2 = jnp.where(
                    avalid,
                    mi(ax - arx) ** 2 + mi(ay - ary) ** 2 + mi(az - arz) ** 2,
                    0.0,
                )
                lim = (0.5 * cfg_t.skin) ** 2
                ovf = ovf | (jnp.max(d2) > lim) | (jnp.max(a2) > lim)
                return (px, py, pz, vx, vy, vz, aid,
                        ax, ay, az, avx, avy, avz, aaid, acell, arank, ovf), None

            return block

        carry = (px, py, pz, vx, vy, vz, aid,
                 ax, ay, az, avx, avy, avz, aaid, acell, arank, ovf)
        if blocks:
            carry, _ = jax.lax.scan(lf_block(rebin_every), carry, None, length=blocks)
        if rem:
            carry, _ = lf_block(rem)(carry, None)
        (px, py, pz, vx, vy, vz, aid,
         ax, ay, az, avx, avy, avz, aaid, acell, arank, ovf) = carry

        # Closing half un-kick re-syncs velocities to integer steps.
        bindF, knovfF = bindings(acell, acell < nc, aid < sent)
        ovf = ovf | knovfF
        fF = forces(px, py, pz, aid < sent, ax, ay, az, acell < nc, bindF)
        vx, vy, vz = vx - half_dt * fF[0], vy - half_dt * fF[1], vz - half_dt * fF[2]
        avx = avx - half_dt * fF[3]
        avy = avy - half_dt * fF[4]
        avz = avz - half_dt * fF[5]

        valid_f = aid < sent
        cval = lambda v: jnp.where(valid_f, jnp.float32(v), 0.0)
        pos = jnp.stack([px, py, pz], axis=-1)
        grid = CellDenseState(
            positions=pos,
            velocities=jnp.stack([vx, vy, vz], axis=-1),
            inv_masses=cval(1.0 / uniform_mass),
            half_sigma=cval(uniform_params[0]),
            twice_sqrt_eps=cval(uniform_params[1]),
            atom_id=aid,
            valid=valid_f,
            ref_positions=pos,
            step=state.grid.step + num_steps,
            overflow=ovf,
            charges=None,
        )
        return StragglerState(
            grid=grid,
            aux_positions=jnp.stack([ax, ay, az], axis=-1),
            aux_velocities=jnp.stack([avx, avy, avz], axis=-1),
            aux_atom_id=aaid,
            aux_cell=acell,
            aux_rank=arank,
        )

    def wide_state(state: StragglerState) -> CellDenseState:
        """Rebuild the C_w slot state (grid + inserted aux) — the bridge to
        every existing wide-capacity facility (energy, gather, tests)."""
        gr = state.grid
        avalid = state.aux_cell < nc
        wf = _widen_fields(
            [gr.positions[..., 0], gr.positions[..., 1], gr.positions[..., 2],
             gr.velocities[..., 0], gr.velocities[..., 1], gr.velocities[..., 2],
             jnp.where(gr.valid, gr.atom_id, sent)],
            [state.aux_positions[..., 0], state.aux_positions[..., 1],
             state.aux_positions[..., 2], state.aux_velocities[..., 0],
             state.aux_velocities[..., 1], state.aux_velocities[..., 2],
             state.aux_atom_id],
            state.aux_cell, state.aux_rank, avalid, config,
        )
        valid_w = wf[6] < sent
        cval = lambda v: jnp.where(valid_w, jnp.float32(v), 0.0)
        return CellDenseState(
            positions=jnp.stack(wf[0:3], axis=-1),
            velocities=jnp.stack(wf[3:6], axis=-1),
            inv_masses=cval(1.0 / uniform_mass),
            half_sigma=cval(uniform_params[0]),
            twice_sqrt_eps=cval(uniform_params[1]),
            atom_id=wf[6],
            valid=valid_w,
            ref_positions=jnp.stack(wf[0:3], axis=-1),
            step=gr.step,
            overflow=gr.overflow,
            charges=None,
        )

    @jax.jit
    def energy(state: StragglerState):
        st = wide_state(state)
        _, e, w = cell_dense_forces(st, model, cfg_w, compute_energy=True)
        pe = jnp.sum(jnp.where(st.valid, e, 0.0))
        vir = jnp.sum(jnp.where(st.valid, w, 0.0))
        ke = 0.5 * jnp.float32(uniform_mass) * jnp.sum(
            jnp.where(st.valid[..., None], st.velocities**2, 0.0)
        )
        return pe, vir, ke

    rollout.wide_state = wide_state  # exposed for tests/gather
    return rollout, energy


def gather_straggler_atoms(state: StragglerState, config: StragglerConfig, num_atoms: int):
    """Slot+aux layout → dense (N, 3) arrays in original atom order (host)."""
    pos = np.zeros((num_atoms, 3), np.float32)
    vel = np.zeros((num_atoms, 3), np.float32)
    ids = np.asarray(state.grid.atom_id).reshape(-1)
    keep = np.asarray(state.grid.valid).reshape(-1)
    pos[ids[keep]] = np.asarray(state.grid.positions).reshape(-1, 3)[keep]
    vel[ids[keep]] = np.asarray(state.grid.velocities).reshape(-1, 3)[keep]
    akeep = np.asarray(state.aux_cell) < config.grid.num_cells
    aids = np.asarray(state.aux_atom_id)[akeep]
    pos[aids] = np.asarray(state.aux_positions)[akeep]
    vel[aids] = np.asarray(state.aux_velocities)[akeep]
    return pos, vel
