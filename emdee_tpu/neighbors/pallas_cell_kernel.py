"""Pallas TPU kernel for the dense-cell LJ force pass.

The hand-written successor to `cell_dense.cell_dense_forces` — the role
`compute_tile!` plays in the reference (nonbonded.jl:44-107), re-imagined for
TPU. Design:

- **Everything lives in VMEM.** At 100k atoms the whole slot grid (positions,
  params, forces) is ~14 MB — it fits on-chip, so the kernel reads HBM once
  and the pair loop never touches it.  (The reference streams through global
  memory with atomics; TPU VMEM makes the entire problem resident.)
- **Ghost-padded grid, zero PBC math.**  XLA-side prep builds a (M+2)³ ghost
  grid whose ghost cells are coordinate-shifted copies (±L), so the kernel
  computes raw differences — no minimum-image rounds per pair (the reference
  pays `minimum_image` per pair, nonbonded.jl:70).
- **Pencil tiles.**  One grid program per (z, y) cell pencil.  A pencil's
  pair tile is (C sublanes × M·C lanes): center atom a of every cell cx
  against neighbor atom b of cell cx+dx, for a whole x-row at once —
  x-neighborhoods become *contiguous lane windows* of the ghost row,
  so the 27-cell stencil is 9 row reads × 3 lane windows.
- **MXU segment reduction.**  Per-cell force sums are one (C, M·C)·(M·C, M)
  block-diagonal matmul — the systolic array does the reduction for free.
- **Newton's 3rd law without atomics.**  The TPU grid is sequential, so
  reaction forces accumulate into a VMEM-resident ghost-layout buffer with
  plain read-modify-write; ghost faces are folded back by XLA afterwards.
  Half-shell stencil (13 offsets) + a self-cell pass = each cross-cell pair
  is evaluated exactly once (the reference's action/reaction split,
  cells.jl:38-44, without the linked lists).
- **Sentinel masking.**  Empty slots are parked at distinct far-away
  coordinates; the switching function's clamp then zeroes their energy and
  force *exactly* — no mask tensors in the hot loop (the TPU answer to the
  reference's undef-padding contract, nonbonded.jl:28-38).

Numerics are float32 and bit-identical in structure to the reference's pair
math (lennard_jones.jl:25-42) in true-cutoff mode.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Tuple

from numpy.polynomial import chebyshev as npcheb

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emdee_tpu.neighbors.cell_dense import CellDenseConfig, CellDenseState, _state_box
from emdee_tpu.potentials.lennard_jones import LennardJonesModel

# Half-shell offsets (vz, vy, vx) lexicographically positive — each cross-cell
# pair is visited exactly once.
_HALF_SHELL = [
    (dz, dy, dx)
    for dz in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dx in (-1, 0, 1)
    if (dz, dy, dx) > (0, 0, 0)
]

_FAR = 1.0e5  # sentinel distance scale for empty slots


def _debug_env(name: str) -> str:
    """Read a debug/ablation env toggle — honored ONLY under EMDEE_DEBUG=1.

    These toggles change physics (EMDEE_ABLATE_ROWSUM) or tuning
    (EMDEE_ROWS_PER_PROG) and exist for perf instrumentation; a stray value
    in a user's environment must never alter a production run."""
    import os

    if not os.environ.get("EMDEE_DEBUG"):
        return ""
    return os.environ.get(name, "")


def _recip_newton_steps() -> int:
    """Newton refinement steps after `pl.reciprocal(approx=True)`.

    One step suffices only where the VRCP seed accuracy is MEASURED (~2⁻¹⁶ on
    v5e → one step reaches 2⁻²²·⁷, f32-ulp-limited).  An unmeasured TPU
    generation with a coarser seed would silently reintroduce NVE energy
    drift (~1%/1500 steps was observed with insufficient reciprocal
    accuracy), so unknown generations get two steps (+~3% kernel time).
    Override with EMDEE_RECIP_NEWTON=1|2 — honored only under EMDEE_DEBUG=1
    (it changes numerics; a stray value in a user environment on an
    unmeasured TPU generation must not silently reintroduce drift)."""
    import os

    env = _debug_env("EMDEE_RECIP_NEWTON")
    if env:
        return max(1, int(env))
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    if not gen:
        try:
            gen = jax.devices()[0].device_kind
        except Exception:
            gen = ""
    gen = gen.lower().replace(" ", "")
    measured_good = ("v5e", "v5lite")
    return 1 if any(tag in gen for tag in measured_good) else 2


_NEWTON_STEPS: int | None = None


def _newton_steps() -> int:
    """Cached `_recip_newton_steps` (device query deferred past import)."""
    global _NEWTON_STEPS
    if _NEWTON_STEPS is None:
        _NEWTON_STEPS = _recip_newton_steps()
    return _NEWTON_STEPS


def _recip(x, interpret: bool, steps: int):
    """Full-f32-accuracy reciprocal: VRCP seed + `steps` Newton refinements
    (exact division in interpreter mode, where pl.reciprocal is unavailable)."""
    if interpret:
        return 1.0 / x
    r = pl.reciprocal(x, approx=True)
    for _ in range(steps):
        r = r * (2.0 - x * r)
    return r


def _sentinel_far(config: CellDenseConfig) -> jax.Array:
    """(M³, C) far-away sentinel coordinates for empty slots, pairwise ≥ 7
    apart for any two slots the kernel can ever pair, so the switching clamp
    zeroes their interactions exactly (no NaN, no masks).

    Uniqueness is only needed within ±1-cell neighborhoods (the half-shell
    stencil never pairs cells further apart), so the id is (cell coords mod 4,
    slot) — bounded by 64·C, hence the 7· spacing stays EXACT in f32 at any
    system size (a global slot id would lose integer exactness past ~2.4M
    slots and let two sentinels collide into r²=0).  Wrap-seam ghost copies
    are box-shifted along the crossing coordinate by `_ghost`, so an id
    collision across the periodic seam still yields distance ≥ box > rc."""
    m, c = config.cells_per_dim, config.capacity
    cell = jnp.arange(m * m * m, dtype=jnp.int32)
    gz, gy, gx = cell // (m * m), (cell // m) % m, cell % m
    hood = ((gz & 3) * 16 + (gy & 3) * 4 + (gx & 3)).astype(jnp.float32)
    slot = jnp.arange(c, dtype=jnp.float32)
    return _FAR + 7.0 * (hood[:, None] * c + slot[None, :])


def _sentinel_positions(state: CellDenseState, config: CellDenseConfig):
    """Replace empty-slot positions with the `_sentinel_far` coordinates
    (same value for all three components)."""
    far = _sentinel_far(config).reshape(state.valid.shape)
    pos = jnp.where(state.valid[..., None], state.positions, far[..., None])
    return pos


def _ghost(arr: jax.Array, m: int, axis_shift=None, box: float = 0.0) -> jax.Array:
    """(M, M, M, C[,3]) → (G, G, G, C[,3]) ghost padding with PBC copies.

    axis_shift ∈ {0,1,2} marks which *coordinate* array this is (z, y, x),
    whose ghost copies must be offset by ∓box along the wrap direction.
    """

    def pad(a, axis, coord_axis):
        lo = jax.lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis], axis=axis)
        hi = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        if axis_shift is not None and coord_axis == axis_shift:
            lo = lo - box
            hi = hi + box
        return jnp.concatenate([lo, a, hi], axis=axis)

    # axes: 0=z, 1=y, 2=x
    arr = pad(arr, 2, 2)
    arr = pad(arr, 1, 1)
    arr = pad(arr, 0, 0)
    return arr


def _const_tiles(m: int, c: int):
    """Constant mask/matmul operand tiles, precomputed host-side once per
    (M, C) shape so the kernel spends no VPU cycles rebuilding them per
    program (iota+compare chains measured ~5-7% of the hot loop)."""
    mc = m * c
    lane_in_cell = np.arange(mc, dtype=np.int64) % c
    is_self = (lane_in_cell[None, :] == np.arange(c)[:, None]).astype(np.float32)
    expand = (
        np.arange(m)[:, None] == (np.arange(mc)[None, :] // c)
    ).astype(np.float32)  # (M, M·C)
    seg = (
        (np.arange(mc)[:, None] // c) == np.arange(m)[None, :]
    ).astype(np.float32)  # (M·C, M)
    return (
        jnp.asarray(is_self),
        jnp.asarray(expand),
        jnp.asarray(seg, jnp.bfloat16),
    )


def _strag_const_tiles(m: int, kn: int):
    """Constant operand tiles for the straggler pass: the (M, M·Kn_pad)
    center expansion (lane (cx, k) ← cell cx; pad lanes map to no cell) and
    the (M·Kn_pad, M) bf16 segment reduction back to per-cell center
    forces.  The lane dim is padded to a 128 multiple — see _make_kernel."""
    mkn = -(-(m * kn) // 128) * 128
    lane_cell = np.arange(mkn) // kn  # ≥ m in the pad region
    expand_kn = (
        np.arange(m)[:, None] == lane_cell[None, :]
    ).astype(np.float32)
    seg_kn = (
        lane_cell[:, None] == np.arange(m)[None, :]
    ).astype(np.float32)
    return (jnp.asarray(expand_kn), jnp.asarray(seg_kn, jnp.bfloat16))


def _prep_inputs(
    state: CellDenseState,
    config: CellDenseConfig,
    uniform: bool = False,
    kc: float = 0.0,
    excl=None,
    bond_energy: bool = False,
):
    """XLA-side data prep: ghost rows + transposed center arrays.

    kc > 0 adds a charge field pre-scaled by √kc (so the kernel's qᵢ'·qⱼ'
    product is already kc·qᵢ·qⱼ — one fewer multiply per pair).

    excl = (ids, mlj, mcs[, (kb, kr0, kr02)]): slot-space exclusion tags —
    adds the neighbor atom-id ghost field and 2-3·E center rows (ids exact
    in f32); the optional 4th element appends 2·E_b harmonic-bond weight
    rows (3·E_b with `bond_energy` for the kernel's energy variant)."""
    m, c = config.cells_per_dim, config.capacity
    g = m + 2
    pos = _sentinel_positions(state, config)
    grid = lambda a: a.reshape(m, m, m, c)
    sbox = _state_box(state, config)

    gx = _ghost(grid(pos[..., 0]), m, axis_shift=2, box=sbox).reshape(g * g, g * c)
    gy = _ghost(grid(pos[..., 1]), m, axis_shift=1, box=sbox).reshape(g * g, g * c)
    gz = _ghost(grid(pos[..., 2]), m, axis_shift=0, box=sbox).reshape(g * g, g * c)

    # Centers as one stacked (M², n·C, M) array: one (nC, M) pencil block per
    # kernel program — Mosaic forbids dynamic lane-slicing at non-128 offsets
    # so the pencil arrives as its own block, and stacking the fields lets
    # the kernel expand them with a single MXU matmul (small matmuls are
    # latency-bound; batching them is the difference between 126 and ~9 MXU
    # dispatches per program).
    def center(a):
        return a.reshape(m * m, m, c).transpose(0, 2, 1)  # (M², C, M)

    cen_fields = [center(pos[..., 0]), center(pos[..., 1]), center(pos[..., 2])]
    ghosts = [gx, gy, gz]
    if not uniform:
        ghosts.append(_ghost(grid(state.half_sigma), m).reshape(g * g, g * c))
        ghosts.append(_ghost(grid(state.twice_sqrt_eps), m).reshape(g * g, g * c))
        cen_fields += [center(state.half_sigma), center(state.twice_sqrt_eps)]
    if kc:
        qs = jnp.sqrt(jnp.float32(kc)) * state.charges
        ghosts.append(_ghost(grid(qs), m).reshape(g * g, g * c))
        cen_fields.append(center(qs))
    if excl is not None:
        ids, mlj, mcs = excl[:3]
        aid_f = jnp.where(state.valid, state.atom_id, -2).astype(jnp.float32)
        ghosts.append(_ghost(grid(aid_f), m).reshape(g * g, g * c))
        e_n = ids.shape[-1]
        cen_fields += [center(ids[..., e]) for e in range(e_n)]
        cen_fields += [center(mlj[..., e]) for e in range(e_n)]
        if mcs is not None:
            cen_fields += [center(mcs[..., e]) for e in range(e_n)]
        bond = excl[3] if len(excl) > 3 else None
        if bond is not None:
            kb, kr0, kr02 = bond
            e_b = kb.shape[-1]
            cen_fields += [center(kb[..., e]) for e in range(e_b)]
            cen_fields += [center(kr0[..., e]) for e in range(e_b)]
            if bond_energy:
                cen_fields += [center(kr02[..., e]) for e in range(e_b)]
    centers = jnp.concatenate(cen_fields, axis=1)  # (M², n·C, M)
    return tuple(ghosts) + (centers,) + _const_tiles(m, c)


def _fold_ghosts(react: jax.Array, m: int, c: int) -> jax.Array:
    """(G², G·C) ghost-layout accumulator → (M³, C) interior with PBC folds."""
    g = m + 2
    r = react.reshape(g, g, g, c)

    def fold(a, axis):
        n = a.shape[axis]
        lo_ghost = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        hi_ghost = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
        body = jax.lax.slice_in_dim(a, 1, n - 1, axis=axis)
        # ghost x_g=0 ↔ interior x=M−1 (last); x_g=G−1 ↔ x=0 (first).
        first = jax.lax.slice_in_dim(body, 0, 1, axis=axis) + hi_ghost
        mid = jax.lax.slice_in_dim(body, 1, m - 1, axis=axis)
        last = jax.lax.slice_in_dim(body, m - 1, m, axis=axis) + lo_ghost
        return jnp.concatenate([first, mid, last], axis=axis)

    r = fold(r, 2)
    r = fold(r, 1)
    r = fold(r, 0)
    return r.reshape(m**3, c)


_TWO_OVER_SQRT_PI = 1.1283791670955126


@lru_cache(maxsize=None)
def _dsf_polys(alpha: float, rc: float, e_shift: float, f_shift: float,
               deg: int = 10):
    """Chebyshev fits (monomial Horner form in t = r/rc) of the two DSF pair
    functions multiplied by r — both ENTIRE functions of r, so the fit
    converges super-geometrically over the full [0, rc] domain:

      Q_f(r) = r·mre(r) = erfc(αr) + (2α/√π)·r·e^{−α²r²} − f_shift·r²
      Q_e(r) = r·e(r)   = erfc(αr) + (f_shift·(r−rc) − e_shift)·r

    where mre(r) = r·(g(r) − f_shift) is the DSF −r·dE/dr contribution and
    e(r) the DSF pair energy (potentials/coulomb.py:9-10).  Measured fit
    error at deg=10 in f32 Horner: ≤ 9.2e-8 on mre — tighter than the
    A&S 7.1.26 erfc chain this replaces (1.5e-7) at a fraction of the VPU
    cost: one 10-fma Horner per function instead of exp + VRCP division +
    5-term Horner + assembly (~15 ops and a transcendental per pair).
    Host-side numpy fit, cached per (α, rc) — trace-time only."""
    a, rc = float(alpha), float(rc)
    c2 = _TWO_OVER_SQRT_PI * a
    r = np.linspace(0.0, rc, 4001)
    erfc_ar = np.array([math.erfc(v) for v in a * r])
    qf = erfc_ar + c2 * r * np.exp(-((a * r) ** 2)) - f_shift * r * r
    qe = erfc_ar + (f_shift * (r - rc) - e_shift) * r
    x = 2.0 * r / rc - 1.0

    def mono_t(vals):
        # Chebyshev fit in x = 2t−1, re-expanded to ascending monomial
        # coefficients in t = r/rc (O(1) coefficients ⇒ stable f32 Horner).
        cf = npcheb.chebfit(x, vals, deg)
        p = npcheb.cheb2poly(cf)
        comp = np.zeros(deg + 1)
        base = np.array([1.0])
        for k in range(deg + 1):
            comp[: k + 1] += p[k] * base
            base = np.convolve(base, [-1.0, 2.0])
        return tuple(float(v) for v in comp)

    return mono_t(qf), mono_t(qe)


def _unpack_centers(cen_all, c, uniform, has_q, excl_e, excl_cs, excl_eb=0, bond_energy=False):
    """Slice the batched (n·C, M·C) center expansion into named tiles."""
    cen = {"x": cen_all[0:c], "y": cen_all[c : 2 * c], "z": cen_all[2 * c : 3 * c]}
    nxt = 3 * c
    if not uniform:
        cen["hs"] = cen_all[nxt : nxt + c]
        cen["tse"] = cen_all[nxt + c : nxt + 2 * c]
        nxt += 2 * c
    if has_q:
        cen["q"] = cen_all[nxt : nxt + c]
        nxt += c
    if excl_e:
        cen["eids"] = [cen_all[nxt + e * c : nxt + (e + 1) * c] for e in range(excl_e)]
        nxt += excl_e * c
        cen["mlj"] = [cen_all[nxt + e * c : nxt + (e + 1) * c] for e in range(excl_e)]
        nxt += excl_e * c
        if excl_cs:
            cen["mcs"] = [
                cen_all[nxt + e * c : nxt + (e + 1) * c] for e in range(excl_e)
            ]
            nxt += excl_e * c
    if excl_eb:
        # Harmonic-bond weights at the matching tag slots (prefix width E_b):
        # k and k·r0 for forces, +k·r0² for the energy variant.
        cen["kb"] = [cen_all[nxt + e * c : nxt + (e + 1) * c] for e in range(excl_eb)]
        nxt += excl_eb * c
        cen["kr0"] = [cen_all[nxt + e * c : nxt + (e + 1) * c] for e in range(excl_eb)]
        nxt += excl_eb * c
        if bond_energy:
            cen["kr02"] = [
                cen_all[nxt + e * c : nxt + (e + 1) * c] for e in range(excl_eb)
            ]
            nxt += excl_eb * c
    return cen


def _build_pair_pass(
    *,
    c,
    mc,
    gc,
    rs2,
    invd2,
    n_newton,
    interpret,
    compute_energy,
    uniform_params,
    coulomb,
    excl_e,
    excl_cs,
    is_self,
    load,
    cen,
    excl_eb=0,
):
    """Shared pair-pass builder for the VMEM-resident and HBM-streaming
    kernels — ONE copy of the hot pair math, parameterized over how neighbor
    rows are fetched.

    load(name, dz, dy, win) → (1, mc) lane-window of ghost field `name`
    ('x'/'y'/'z'/'hs'/'tse'/'q'/'aid') at row offset (dz, dy); cen: dict of
    (C, M·C) expanded center tiles (`_unpack_centers`); is_self: (C, M·C)
    0/1 same-slot diagonal tile (materialized value, not a ref).

    Returns pair_pass(dz, dy, dx, self_pass, acc) → (acc, reaction):
    reaction is None on the self-inclusive pass, else a tuple of (1, gc)
    full-row padded Newton-reaction rows (fx, fy, fz[, e, w])."""
    a_m = 60.0 * invd2 * rs2  # mrg(x) linear coefficient: 60·rs²/(rc²−rs²)
    uniform = uniform_params is not None
    if uniform:
        hs_u, tse_u = uniform_params
        sig2_u = float((2.0 * hs_u) ** 2)  # σᵢⱼ² for identical atoms
        eps4_u = float(tse_u * tse_u)  # 4εᵢⱼ
    if coulomb is not None:
        cl_alpha, cl_rc, cl_eshift, cl_fshift, _cl_kc = coulomb
        cl_rc2 = cl_rc * cl_rc
        cl_inv_rc = 1.0 / cl_rc
        cl_pf, cl_pe = _dsf_polys(cl_alpha, cl_rc, cl_eshift, cl_fshift)

    def pair_pass(dz, dy, dx, self_pass, acc):
        fx_a, fy_a, fz_a, e_a, w_a = acc
        win = (dx + 1) * c
        nx = load("x", dz, dy, win)
        ny = load("y", dz, dy, win)
        nz = load("z", dz, dy, win)

        dvx = cen["x"] - nx
        dvy = cen["y"] - ny
        dvz = cen["z"] - nz
        r2 = dvx * dvx + dvy * dvy + dvz * dvz
        if self_pass:
            r2 = r2 + is_self
        # Approximate reciprocal + device-gated Newton refinement: one step
        # on generations whose VRCP seed is measured (~2⁻¹⁶ on v5e →
        # 2⁻²²·⁷, f32-ulp-limited), two on unknown generations
        # (_recip_newton_steps).
        rinv = _recip(r2, interpret, n_newton)
        if uniform:
            s2 = sig2_u * rinv
            s6 = s2 * s2 * s2
            t6 = eps4_u * s6  # 4ε·s⁻⁶
        else:
            nhs = load("hs", dz, dy, win)
            ntse = load("tse", dz, dy, win)
            sig = cen["hs"] + nhs
            s2 = sig * sig * rinv
            s6 = s2 * s2 * s2
            t6 = (cen["tse"] * ntse) * s6
        if self_pass:
            t6 = t6 * (1.0 - is_self)
        csc = None
        kb_acc = kr0_acc = kr02_acc = None
        if excl_e:
            # Kernel-resident exclusions: compare the neighbor's atom id
            # against the center's E tag ids (exact integers in f32) and
            # scale the pair terms — no masks, no gathers, no correction
            # pass (~3E VPU ops/pair instead of a 4+ ms atom-space round
            # trip at 100k atoms).
            naid = load("aid", dz, dy, win)
            ljsc = 1.0
            csc = 1.0 if excl_cs else None
            if excl_eb:
                kb_acc = jnp.zeros_like(r2)
                kr0_acc = jnp.zeros_like(r2)
                if compute_energy:
                    kr02_acc = jnp.zeros_like(r2)
            for e_i in range(excl_e):
                match = (cen["eids"][e_i] == naid).astype(jnp.float32)
                ljsc = ljsc - match * cen["mlj"][e_i]
                if excl_cs:
                    csc = csc - match * cen["mcs"][e_i]
                if excl_eb and e_i < excl_eb:
                    # Harmonic bonds ride the SAME match bits (a bond is a
                    # 1-2 exclusion pair, inserted first so its weights sit
                    # in the E_b-wide tag prefix): accumulate k and k·r0,
                    # then one force term below — removes the bond rows from
                    # the gather-bound scatter path entirely.
                    kb_acc = kb_acc + match * cen["kb"][e_i]
                    kr0_acc = kr0_acc + match * cen["kr0"][e_i]
                    if compute_energy:
                        kr02_acc = kr02_acc + match * cen["kr02"][e_i]
            t6 = t6 * ljsc
        t12 = t6 * s6  # 4ε·s⁻¹²
        x = jnp.clip((r2 - rs2) * invd2, 0.0, 1.0)
        # Switched −r·dE/dr as tot = t12·A(x) − t6·B(x).  A = 12·gsw+mrg
        # and B = 6·gsw+mrg are STATIC degree-5 polynomials in the
        # clipped x: mrg's r² factor equals rs2 + (rc²−rs²)·x wherever
        # mrg ≠ 0 (its x² and (1−x)² factors zero it at both clip
        # boundaries), so the whole switch reduces to two Horner chains —
        # ~5 fewer VPU ops/pair than gsw/mrg/u1 assembly (verified exact
        # to f64 roundoff against the expanded form).
        pa = ((((-12.0 * x + (a_m + 60.0)) * x - (60.0 + 2.0 * a_m)) * x + a_m) * x) * x + 12.0
        pb = ((((24.0 * x + (a_m - 30.0)) * x - 2.0 * a_m) * x + a_m) * x) * x + 6.0
        tot = t12 * pa - t6 * pb  # switched −r·dE/dr
        rs_inv = r = None
        if excl_eb or coulomb is not None:
            rs_inv = jnp.sqrt(rinv)  # 1/r (rinv is full-accuracy 1/r²)
            r = r2 * rs_inv
        e_b = None
        if excl_eb:
            # In-kernel harmonic bond: E = ½k(r−r0)² ⇒ −r·dE/dr =
            # k·r0·r − k·r² with the tag-matched (kb, kr0) accumulators
            # (zero on non-bonded pairs).  The f32 cancellation k·r0·r −
            # k·r² ≈ k·(r0−r)·r loses ~2 digits of the ~4500 kJ/mol
            # operand scale → ~2e-4 absolute in tot, well under the pair
            # force noise floor.  The r² < rc² mask kills PERIODIC IMAGES
            # of the partner: on a small grid (M=3-4) the stencil also
            # reaches the partner's ±L ghost copies, whose ids match the
            # tag too — their distance is ≥ L − r_bond ≥ 3(rc+skin) −
            # r_bond > rc, so the true bond (r ≪ rc) is kept exactly.
            rc2_b = rs2 + 1.0 / invd2
            in_b = (r2 < rc2_b).astype(jnp.float32)
            kb_m = kb_acc * in_b
            kr0_m = kr0_acc * in_b
            tot = tot + (kr0_m * r - kb_m * r2)
            if compute_energy:
                e_b = 0.5 * (kb_m * r2 + kr02_acc * in_b) - kr0_m * r
        e_c = None
        if coulomb is not None:
            # DSF Coulomb (potentials/coulomb.py) as ONE Horner chain: the
            # pair functions ×r are entire, so a degree-10 monomial fit in
            # t = r/rc (`_dsf_polys`) evaluates r·mre(r) to ≤9.2e-8 —
            # tighter than the former A&S 7.1.26 erfc + exp assembly at a
            # fraction of the VPU cost.  Charges arrive pre-scaled by √kc.
            nq = load("q", dz, dy, win)
            qq = cen["q"] * nq
            if self_pass:
                qq = qq * (1.0 - is_self)
            if excl_e and csc is not None:
                qq = qq * csc
            # Clamp t to the fit domain: beyond-rc candidates (incl. the
            # _FAR empty-slot sentinels) are zeroed by `inside`, but an
            # unclamped Horner at t ~ 1e4 overflows f32 → inf·0 = NaN.
            t_r = jnp.minimum(r * cl_inv_rc, 1.0)
            qf = jnp.float32(cl_pf[-1])
            for ck in cl_pf[-2::-1]:
                qf = qf * t_r + ck
            inside = (r2 < cl_rc2).astype(jnp.float32)
            mre_c = (qq * inside) * (qf * rs_inv)
            tot = tot + mre_c
            if compute_energy:
                qe = jnp.float32(cl_pe[-1])
                for ck in cl_pe[-2::-1]:
                    qe = qe * t_r + ck
                e_c = (qq * inside) * (qe * rs_inv)
        gf = tot * rinv
        gfx = gf * dvx
        gfy = gf * dvy
        gfz = gf * dvz

        # Accumulate full pair tiles; ONE batched segment reduction at the
        # end of the program (MXU dispatches are latency-bound).
        fx_a += gfx
        fy_a += gfy
        fz_a += gfz
        if compute_energy:
            gsw = 1.0 + (x * x * x) * ((-6.0 * x + 15.0) * x - 10.0)
            esw = (t12 - t6) * gsw
            if e_c is not None:
                esw = esw + e_c
            if e_b is not None:
                esw = esw + e_b
            e_a += 0.5 * esw
            w_a += 0.5 * tot
        reaction = None
        if not self_pass:
            # Newton reaction sums over the center axis, padded out to the
            # full ghost row at this dx's lane window (full-row writes are
            # aligned; per-window RMWs would each pay lane rotations).
            if _debug_env("EMDEE_ABLATE_ROWSUM"):
                # Timing ablation ONLY (wrong physics): skip the cross-
                # sublane reduction to measure its share of the pass.
                def row_pad(t):
                    return jnp.pad(
                        -t[0:1], ((0, 0), (win, gc - win - mc))
                    )
            else:
                def row_pad(t):
                    return jnp.pad(
                        -jnp.sum(t, axis=0, keepdims=True), ((0, 0), (win, gc - win - mc))
                    )

            reaction = (row_pad(gfx), row_pad(gfy), row_pad(gfz))
            if compute_energy:
                reaction += (row_pad(-0.5 * esw), row_pad(-0.5 * tot))
        return (fx_a, fy_a, fz_a, e_a, w_a), reaction

    return pair_pass


def _make_kernel(
    config: CellDenseConfig,
    model_consts,
    compute_energy: bool,
    interpret: bool = False,
    uniform_params=None,
    coulomb=None,
    dims=None,
    excl_e: int = 0,
    excl_cs: bool = False,
    excl_eb: int = 0,
    rows_per_program: int = 1,
    strag_kn: int = 0,
):
    """dims=(mz, my, mx): interior cell-grid shape this kernel instance runs
    over — cubic (M, M, M) on one chip, a shard's local block under
    shard_map (distributed/grid_sharded.py).

    rows_per_program: (z, y) pencils per grid program — amortizes the fixed
    per-program cost (prologue, DMA waits, MXU dispatch latency) and batches
    the center-expansion and segment-reduction matmuls across pencils; the
    last program's overhang sub-pencils are guarded out.

    strag_kn > 0 enables the C-tight straggler pass (uniform-params,
    no-coulomb, no-exclusion, force-only; cell_dense_straggler.py): each
    pencil row additionally pairs its center atoms against up to Kn
    "straggler" atoms — occupancy-tail atoms parked OUTSIDE the slot grid in
    a tiny auxiliary buffer so the grid capacity can sit at the occupancy
    MEAN (pair work ∝ C²) instead of covering the 2.5σ tail.  The straggler
    list of row (z, y) holds every aux atom parked in the row's 9-hood
    (z±1, y±1); the tile covers all M x-cells, so x needs no precision and
    the r² cutoff trims.  Straggler coordinates arrive as dense (rows, 1,
    Kn) per-row lists (empty lanes masked via `smask`, NOT sentinels —
    this tile min-images raw deltas, which would wrap a far sentinel back
    into the box); center-slot validity rides an extra 0/1 center field for
    the same reason.  Newton-3: the straggler side of each pair leaves as a
    per-program (3, M·Kn) reaction-row output (one write, no cross-program
    RMW), folded to per-aux forces by the caller."""
    rpp = rows_per_program
    c = config.capacity
    mz, my, mx = dims if dims is not None else (config.cells_per_dim,) * 3
    # Overhang guards are only needed when the grid over-covers the rows —
    # unconditional pl.when regions around the reaction RMWs break Mosaic's
    # scheduling (measured: the guarded rpp=1 kernel lost ~20%).
    _ragged = (-(-(mz * my) // rpp)) * rpp != (mz * my)
    gz_n = mz + 2
    gy_n = my + 2
    gx_n = mx + 2
    m = mx  # lane-axis cell count
    g = gx_n
    mc = mx * c
    rs2, invd2 = model_consts
    n_newton = _newton_steps()
    uniform = uniform_params is not None
    if strag_kn:
        if not uniform or coulomb is not None or excl_e or compute_energy:
            raise NotImplementedError(
                "straggler pass: uniform-params force-only kernels "
                "(energies/virials go through the XLA wide-state path)"
            )
        if mz < 3 or my < 3:
            raise ValueError("straggler pass needs ≥3 cells per sharded axis")
    # Straggler lane dim padded to a 128 multiple: non-multiple lane dims
    # (m·Kn = 192, 272, …) hit Mosaic vpad'd-load crashes / silent layout
    # bugs on real TPUs; the pad lanes carry smask=0 and expand to no cell.
    mkn = -(-(m * strag_kn) // 128) * 128
    if strag_kn:
        s_box = float(config.box)
        s_invbox = 1.0 / s_box
        s_hs_u, s_tse_u = uniform_params
        s_sig2 = float((2.0 * s_hs_u) ** 2)
        s_eps4 = float(s_tse_u * s_tse_u)
        s_am = 60.0 * invd2 * rs2

    def kernel(*refs):
        # Input order: coords [+ params] [+ charges] [+ atom ids] + centers
        # + const tiles [+ straggler tiles: expand_kn, seg_kn, x, y, z, mask].
        n_ghost = (
            3 + (0 if uniform else 2) + (0 if coulomb is None else 1)
            + (1 if excl_e else 0)
        )
        ghosts = refs[:n_ghost]
        centers, is_self, expand, seg_bf16 = refs[n_ghost : n_ghost + 4]
        n_in = n_ghost + 4
        if strag_kn:
            expand_kn, seg_kn_bf16, sgx, sgy, sgz, smask = refs[n_in : n_in + 6]
            n_in += 6
        outs = refs[n_in:]
        gx, gy, gz = ghosts[:3]
        if not uniform:
            ghs, gtse = ghosts[3:5]
        gaid = ghosts[-1] if excl_e else None
        gq = None
        if coulomb is not None:
            gq = ghosts[-2] if excl_e else ghosts[-1]
        (fx, fy, fz, react) = outs[:4]
        if compute_energy:
            (e_out, w_out, er_out, wr_out) = outs[4:]
        sro = outs[4] if strag_kn else None
        i = pl.program_id(0)
        n_rows = mz * my

        @pl.when(i == 0)
        def _zero():
            react[:] = jnp.zeros_like(react)
            if compute_energy:
                er_out[:] = jnp.zeros_like(er_out)
                wr_out[:] = jnp.zeros_like(wr_out)

        # Center tiles: (C, M) blocks → per-cell lane expansion (C, M·C),
        # element [a, cx·C + k] = center[a, cx], via one MXU matmul with the
        # precomputed 0/1 expansion matrix (pltpu.repeat is tiled abab…, not
        # interleaved).  HIGHEST precision is load-bearing: the MXU multiplies
        # in bf16 by default, which quantizes positions (~1e-3) — a center
        # atom then misses its own ghost copy by a hair and 1/r² explodes.
        mm = lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )

        # Per-cell segment reduction via MXU with the precomputed bf16 0/1
        # matrix.  Mosaic's default f32 dot is a single bf16 pass (quantizes
        # values) and HIGH is unimplemented — emulate f32 with a 3-term bf16
        # split (~24 mantissa bits; the 0/1 seg matrix is exact in bf16).
        def segsum(t, sb=None):
            sb = seg_bf16[...] if sb is None else sb
            hi = t.astype(jnp.bfloat16)
            rem = t - hi.astype(jnp.float32)
            mid = rem.astype(jnp.bfloat16)
            lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            out = jnp.dot(hi, sb, preferred_element_type=jnp.float32)
            out += jnp.dot(mid, sb, preferred_element_type=jnp.float32)
            out += jnp.dot(lo, sb, preferred_element_type=jnp.float32)
            return out

        ghost_by_name = {"x": gx, "y": gy, "z": gz}
        if not uniform:
            ghost_by_name["hs"] = ghs
            ghost_by_name["tse"] = gtse
        if coulomb is not None:
            ghost_by_name["q"] = gq
        if excl_e:
            ghost_by_name["aid"] = gaid

        def make_load(cz, cy):
            def load(name, dz, dy, win):
                row = (cz + dz + 1) * gy_n + (cy + dy + 1)
                return ghost_by_name[name][pl.ds(row, 1), pl.ds(win, mc)]

            return load

        # ONE batched center expansion for every sub-pencil: (rpp·nC, M·C).
        n_cen_c = centers.shape[1]
        cen_alls = mm(centers[...].reshape(rpp * n_cen_c, m), expand[...])
        if strag_kn:
            # Second expansion keyed (cell cx, straggler k) for the
            # straggler tiles — one batched MXU dispatch for all fields
            # (coords + the trailing center-validity row).
            cen_kn_alls = mm(
                centers[...].reshape(rpp * n_cen_c, m), expand_kn[...]
            )

        n_fields = 5 if compute_energy else 3
        by_row = {}
        for dz, dy, dx in _HALF_SHELL:
            by_row.setdefault((dz, dy), []).append(dx)
        accs = []
        accs_strag = []
        for r in range(rpp):
            row_lin = i * rpp + r
            cz = row_lin // my
            cy = row_lin - cz * my
            cen = _unpack_centers(
                cen_alls[r * n_cen_c : (r + 1) * n_cen_c], c, uniform,
                coulomb is not None, excl_e, excl_cs,
                excl_eb=excl_eb, bond_energy=compute_energy,
            )
            pair_pass = _build_pair_pass(
                c=c, mc=mc, gc=g * c, rs2=rs2, invd2=invd2, n_newton=n_newton,
                interpret=interpret, compute_energy=compute_energy,
                uniform_params=uniform_params, coulomb=coulomb,
                excl_e=excl_e, excl_cs=excl_cs, is_self=is_self[...],
                load=make_load(cz, cy), cen=cen, excl_eb=excl_eb,
            )

            zero_tile = jnp.zeros((c, mc), jnp.float32)
            acc = (zero_tile, zero_tile, zero_tile, zero_tile, zero_tile)
            acc, _ = pair_pass(0, 0, 0, True, acc)
            # Group the half-shell by (dz, dy): the 3 dx-windows of one ghost
            # row combine into a single read-modify-write per row (5, not 13).
            for (dz, dy), dxs in by_row.items():
                row = (cz + dz + 1) * gy_n + (cy + dy + 1)
                parts = []
                for dx in dxs:
                    acc, reaction = pair_pass(dz, dy, dx, False, acc)
                    parts.append(reaction)
                combined = [sum(p[k] for p in parts) for k in range(len(parts[0]))]

                def _rmw(row=row, combined=combined):
                    react[pl.ds(row, 1), :] += combined[0]
                    react[pl.ds(gz_n * gy_n + row, 1), :] += combined[1]
                    react[pl.ds(2 * gz_n * gy_n + row, 1), :] += combined[2]
                    if compute_energy:
                        er_out[pl.ds(row, 1), :] += combined[3]
                        wr_out[pl.ds(row, 1), :] += combined[4]

                if _ragged:
                    pl.when(row_lin < n_rows)(_rmw)  # last program's overhang
                else:
                    _rmw()

            if strag_kn:
                # Straggler tile: this row's center atoms (C, M·Kn expanded)
                # against its ≤Kn 9-hood aux atoms.  Raw deltas are
                # min-imaged (static box — straggler mode has no barostat),
                # so BOTH sides mask invalids explicitly: empty aux lanes
                # via smask, empty center slots via the expanded validity
                # field (their far sentinels would otherwise wrap back into
                # the box and shed garbage onto real stragglers).
                base_k = r * n_cen_c
                ckx = cen_kn_alls[base_k : base_k + c]
                cky = cen_kn_alls[base_k + c : base_k + 2 * c]
                ckz = cen_kn_alls[base_k + 2 * c : base_k + 3 * c]
                ckv = cen_kn_alls[base_k + 3 * c : base_k + 4 * c]
                # Straggler rows arrive pre-tiled to (1, M·Kn) lanes — an
                # in-kernel pltpu.repeat of the (1, Kn) row hit a Mosaic
                # layout error (vpad'd vector.load) on real TPUs.
                ssx = sgx[r, 0:1, :]
                ssy = sgy[r, 0:1, :]
                ssz = sgz[r, 0:1, :]
                ssm = smask[r, 0:1, :]
                dvx = ckx - ssx
                dvy = cky - ssy
                dvz = ckz - ssz
                dvx = dvx - jnp.round(dvx * s_invbox) * s_box
                dvy = dvy - jnp.round(dvy * s_invbox) * s_box
                dvz = dvz - jnp.round(dvz * s_invbox) * s_box
                r2 = (
                    dvx * dvx + dvy * dvy + dvz * dvz
                    + (1.0 - ssm * ckv) * 1.0e8
                )
                rinv = _recip(r2, interpret, n_newton)
                s2 = s_sig2 * rinv
                s6 = s2 * s2 * s2
                t6 = s_eps4 * s6
                t12 = t6 * s6
                x = jnp.clip((r2 - rs2) * invd2, 0.0, 1.0)
                pa = ((((-12.0 * x + (s_am + 60.0)) * x - (60.0 + 2.0 * s_am)) * x + s_am) * x) * x + 12.0
                pb = ((((24.0 * x + (s_am - 30.0)) * x - 2.0 * s_am) * x + s_am) * x) * x + 6.0
                gf = (t12 * pa - t6 * pb) * rinv
                gsx = gf * dvx
                gsy = gf * dvy
                gsz = gf * dvz
                # Straggler-side Newton reaction: one per-program write.
                sro[r] = jnp.concatenate(
                    [
                        -jnp.sum(gsx, axis=0, keepdims=True),
                        -jnp.sum(gsy, axis=0, keepdims=True),
                        -jnp.sum(gsz, axis=0, keepdims=True),
                    ],
                    axis=0,
                )
                # Center-side per-cell reduction (batched 3-split segsum).
                sred = segsum(
                    jnp.concatenate([gsx, gsy, gsz], axis=0), seg_kn_bf16[...]
                )
                accs_strag.append(sred)

            accs.append(acc[:n_fields])

        # ONE batched segment reduction across every sub-pencil's fields.
        stacked = jnp.concatenate([t for acc in accs for t in acc], axis=0)
        reduced = segsum(stacked)  # (rpp·n·C, M)
        for r in range(rpp):
            base = r * n_fields * c
            rfx = reduced[base : base + c]
            rfy = reduced[base + c : base + 2 * c]
            rfz = reduced[base + 2 * c : base + 3 * c]
            if strag_kn:
                rfx = rfx + accs_strag[r][0:c]
                rfy = rfy + accs_strag[r][c : 2 * c]
                rfz = rfz + accs_strag[r][2 * c : 3 * c]
            fx[r] = rfx
            fy[r] = rfy
            fz[r] = rfz
            if compute_energy:
                e_out[r] = reduced[base + 3 * c : base + 4 * c]
                w_out[r] = reduced[base + 4 * c : base + 5 * c]

    return kernel


@partial(
    jax.jit,
    static_argnames=("config", "compute_energy", "interpret", "uniform_params", "coulomb"),
)
def pallas_cell_forces(
    state: CellDenseState,
    model: LennardJonesModel,
    config: CellDenseConfig,
    *,
    compute_energy: bool = False,
    interpret: bool = False,
    uniform_params=None,
    coulomb=None,
    excl=None,
):
    """Drop-in replacement for `cell_dense_forces` (true-cutoff mode).

    uniform_params: optional static (half_sigma, twice_sqrt_eps) float pair.
    When every atom shares the same LJ parameters (the common fluid case),
    passing them compile-time removes the two per-atom parameter fields from
    the hot loop entirely — two fewer ghost arrays, two fewer tile loads and
    three fewer VPU ops per pair.

    coulomb: optional static float tuple (alpha, rc, e_shift, f_shift, kc) —
    the DSFCoulomb constants as plain floats (see `coulomb_consts`); adds DSF
    electrostatics over state.charges to every pair.
    """
    m, c = config.cells_per_dim, config.capacity
    g = m + 2
    uniform = uniform_params is not None

    if excl is not None and coulomb is not None and excl[2] is None:
        # Missing Coulomb scales default to the LJ scales (the
        # correction-pass convention) — never silently skip them.
        excl = (excl[0], excl[1], excl[1]) + tuple(excl[3:])
    inputs = _prep_inputs(
        state, config, uniform=uniform,
        kc=0.0 if coulomb is None else coulomb[4], excl=excl,
        bond_energy=compute_energy,
    )
    rpp = int(_debug_env("EMDEE_ROWS_PER_PROG") or "1")
    bond = None if excl is None or len(excl) < 4 else excl[3]
    outs = halfshell_call(
        inputs, config, (m, m, m),
        compute_energy=compute_energy, interpret=interpret,
        uniform_params=uniform_params, coulomb=coulomb,
        excl_e=0 if excl is None else excl[0].shape[-1],
        excl_cs=excl is not None and excl[2] is not None,
        excl_eb=0 if bond is None else bond[0].shape[-1],
        rows_per_program=rpp,
    )

    def uncenter(a):  # (M², C, M) → (M³, C)
        return a.transpose(0, 2, 1).reshape(m**3, c)

    fx, fy, fz, react = outs[:4]
    forces = jnp.stack([uncenter(fx), uncenter(fy), uncenter(fz)], axis=-1)
    react = react.reshape(3, g * g, g * c)
    rfold = jnp.stack(
        [_fold_ghosts(react[k], m, c) for k in range(3)], axis=-1
    )  # (M³, C, 3)
    forces = forces + rfold

    if not compute_energy:
        return forces, None, None
    e_c, w_c, e_r, w_r = outs[4:]
    energies = uncenter(e_c) + _fold_ghosts(e_r, m, c)
    virials = uncenter(w_c) + _fold_ghosts(w_r, m, c)
    return forces, energies, virials


def halfshell_call(
    inputs,
    config: CellDenseConfig,
    dims,
    *,
    compute_energy: bool = False,
    interpret: bool = False,
    uniform_params=None,
    coulomb=None,
    excl_e: int = 0,
    excl_cs: bool = False,
    excl_eb: int = 0,
    rows_per_program: int = 1,
    strag_inputs=None,
    strag_kn: int = 0,
):
    """Raw half-shell pallas_call over a pre-built ghost grid — no folding.

    inputs: ghost fields ((Gz·Gy, Gx·C) each: coords x/y/z [+ σ/2, 2√ε]
    [+ √kc·q]), the stacked center block (Mz·My, n·C, Mx), and the three
    const tiles from `_const_tiles(mx, c)`.  dims = (mz, my, mx) interior
    cells.  Returns center-layout outputs plus the reaction ghost buffer;
    the caller folds ghosts (periodically on one chip, via reverse halo
    ppermute across shards — distributed/grid_sharded.py).
    """
    mz, my, mx = dims
    c = config.capacity
    gz, gy, gx = mz + 2, my + 2, mx + 2
    mc = mx * c
    rs2 = float(config.switch) ** 2
    rc2 = float(config.cutoff) ** 2
    invd2 = 1.0 / (rc2 - rs2)
    uniform = uniform_params is not None

    rpp = max(1, rows_per_program)
    kernel = _make_kernel(
        config, (rs2, invd2), compute_energy, interpret,
        uniform_params=uniform_params, coulomb=coulomb, dims=dims,
        excl_e=excl_e, excl_cs=excl_cs, excl_eb=excl_eb, rows_per_program=rpp,
        strag_kn=strag_kn,
    )

    # Pallas TPU blocks must have their last dims 128-divisible or full —
    # every operand is therefore a full-array VMEM block (they all fit;
    # that's the point of this kernel) and pencils are sliced in-kernel.
    n_ghost = (
        3 + (0 if uniform else 2) + (0 if coulomb is None else 1)
        + (1 if excl_e else 0)
    )
    n_cen = n_ghost - (1 if excl_e else 0) + excl_e * (3 if excl_cs else 2)
    n_cen += excl_eb * (3 if compute_energy else 2)
    if strag_kn:
        n_cen += 1  # trailing center-validity row (straggler min-image mask)
    ghost_spec = pl.BlockSpec((gz * gy, gx * c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    center_spec = pl.BlockSpec(
        (rpp, n_cen * c, mx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    const_specs = [
        pl.BlockSpec((c, mc), lambda i: (0, 0), memory_space=pltpu.VMEM),  # is_self
        pl.BlockSpec((mx, mc), lambda i: (0, 0), memory_space=pltpu.VMEM),  # expand
        pl.BlockSpec((mc, mx), lambda i: (0, 0), memory_space=pltpu.VMEM),  # seg bf16
    ]
    out_center = pl.BlockSpec((rpp, c, mx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_react = pl.BlockSpec(
        (3 * gz * gy, gx * c), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_ghost1 = pl.BlockSpec((gz * gy, gx * c), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((mz * my, c, mx), jnp.float32),  # fx
        jax.ShapeDtypeStruct((mz * my, c, mx), jnp.float32),  # fy
        jax.ShapeDtypeStruct((mz * my, c, mx), jnp.float32),  # fz
        jax.ShapeDtypeStruct((3 * gz * gy, gx * c), jnp.float32),  # reaction xyz
    ]
    out_specs = [out_center, out_center, out_center, out_react]
    if compute_energy:
        out_shapes += [
            jax.ShapeDtypeStruct((mz * my, c, mx), jnp.float32),  # e center
            jax.ShapeDtypeStruct((mz * my, c, mx), jnp.float32),  # w center
            jax.ShapeDtypeStruct((gz * gy, gx * c), jnp.float32),  # e reaction
            jax.ShapeDtypeStruct((gz * gy, gx * c), jnp.float32),  # w reaction
        ]
        out_specs += [out_center, out_center, out_ghost1, out_ghost1]

    strag_specs = []
    strag_tiles = ()
    if strag_kn:
        mkn = -(-(mx * strag_kn) // 128) * 128
        strag_specs = [
            pl.BlockSpec((mx, mkn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mkn, mx), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(
                (rpp, 1, mkn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ] * 4
        strag_tiles = _strag_const_tiles(mx, strag_kn)
        out_shapes.append(
            jax.ShapeDtypeStruct((mz * my, 3, mkn), jnp.float32)  # strag react
        )
        out_specs.append(
            pl.BlockSpec((rpp, 3, mkn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        inputs = tuple(inputs) + strag_tiles + tuple(strag_inputs)

    call_kwargs = dict(
        grid=(-(-(mz * my) // rpp),),
        in_specs=[ghost_spec] * n_ghost + [center_spec] + const_specs + strag_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
    )
    if interpret:
        call_kwargs["interpret"] = True
    else:
        call_kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        )
    return pl.pallas_call(kernel, **call_kwargs)(*inputs)


# ---------------------------------------------------------------------------
# Streaming variant: unbounded N (ghost rows fed per program from HBM)
# ---------------------------------------------------------------------------

# The half-shell grouped by (dz, dy) ghost row: group (0, 0) holds the dx=+1
# offset (and hosts the self pass), the other four hold all three dx windows.
_HS_ROW_GROUPS = ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
_HS_GROUP_DXS = {(0, 0): (1,), (0, 1): (-1, 0, 1), (1, -1): (-1, 0, 1),
                 (1, 0): (-1, 0, 1), (1, 1): (-1, 0, 1)}


def _prep_streaming_inputs(
    state: CellDenseState,
    config: CellDenseConfig,
    uniform: bool = False,
    kc: float = 0.0,
    excl=None,
    bond_energy: bool = False,
):
    """Ghost fields as (G, G, G·C) arrays + the stacked center block.

    Each ghost field is passed to the streaming pallas_call FIVE times with
    per-(dz, dy) block index maps — program (z, y) reads blocks
    (z+dz+1, y+dy+1, :) straight out of the one HBM copy.  (An earlier
    version materialized the five shifted row views per field in XLA:
    ~100 MB written + re-read per step at 1M atoms, all of it removable
    because the (dz, dy) offsets ARE expressible as block index maps — only
    the x-axis halo windows aren't, and those are `pl.ds` lane slices inside
    the row.)  kc/excl mirror `_prep_inputs`."""
    m, c = config.cells_per_dim, config.capacity
    g = m + 2
    pos = _sentinel_positions(state, config)
    grid = lambda a: a.reshape(m, m, m, c)
    sbox = _state_box(state, config)

    fields = [
        _ghost(grid(pos[..., 0]), m, axis_shift=2, box=sbox),
        _ghost(grid(pos[..., 1]), m, axis_shift=1, box=sbox),
        _ghost(grid(pos[..., 2]), m, axis_shift=0, box=sbox),
    ]
    cen_fields = [pos[..., 0], pos[..., 1], pos[..., 2]]
    if not uniform:
        fields += [_ghost(grid(state.half_sigma), m), _ghost(grid(state.twice_sqrt_eps), m)]
        cen_fields += [state.half_sigma, state.twice_sqrt_eps]
    if kc:
        qs = jnp.sqrt(jnp.float32(kc)) * state.charges
        fields.append(_ghost(grid(qs), m))
        cen_fields.append(qs)
    if excl is not None:
        ids, mlj, mcs = excl[:3]
        aid_f = jnp.where(state.valid, state.atom_id, -2).astype(jnp.float32)
        fields.append(_ghost(grid(aid_f), m))
        e_n = ids.shape[-1]
        cen_fields += [ids[..., e] for e in range(e_n)]
        cen_fields += [mlj[..., e] for e in range(e_n)]
        if mcs is not None:
            cen_fields += [mcs[..., e] for e in range(e_n)]
        bond = excl[3] if len(excl) > 3 else None
        if bond is not None:
            kb, kr0, kr02 = bond
            e_b = kb.shape[-1]
            cen_fields += [kb[..., e] for e in range(e_b)]
            cen_fields += [kr0[..., e] for e in range(e_b)]
            if bond_energy:
                cen_fields += [kr02[..., e] for e in range(e_b)]

    # 4D (G, G, 1, G·C): the unit axis makes the (…, 1, G·C) block's last
    # two dims full-sized, which Mosaic's block-shape rule requires (a
    # (1, 1, G·C) block over (G, G, G·C) has a second-minor block dim of 1
    # against an array dim of G — rejected on real TPUs).
    ghosts = [field.reshape(g, g, 1, g * c) for field in fields]

    def center(a):
        return a.reshape(m * m, m, c).transpose(0, 2, 1)

    centers = jnp.concatenate([center(a) for a in cen_fields], axis=1)
    return ghosts, centers


def _make_streaming_kernel(
    config: CellDenseConfig, model_consts, compute_energy, interpret,
    uniform_params=None, coulomb=None, excl_e: int = 0, excl_cs: bool = False,
    excl_eb: int = 0, dims=None, wrap_reaction: bool = False,
):
    """dims=(mz, my, mx): interior cell-grid shape — cubic (M, M, M) on one
    chip, a shard's local block under shard_map.  One program per (z, y)
    pencil; the five half-shell ghost rows arrive as (1, 1, G·C) blocks of
    the ghost arrays themselves (five index maps per field — no materialized
    views).

    wrap_reaction: single-chip full-box mode — the Newton reaction rows are
    periodically folded IN the kernel (x-ghost lanes in-register; z/y via
    wrapped output index maps in `streaming_halfshell_call`), so the caller
    sums five already-interior-aligned (Mz·My, n_r, Mx·C) groups instead of
    padding ghost grids.  The five full-ghost-grid `jnp.pad`+sum+fold chains
    measured 1.8 ms of the 13.6 ms force step at 1M atoms (~13% — pure HBM
    round trips).  Sharded callers keep the ghost layout: their out-of-shard
    reaction rows ride the reverse halo ppermute and must NOT wrap locally."""
    c = config.capacity
    mz, my, mx = dims if dims is not None else (config.cells_per_dim,) * 3
    m = mx  # lane-axis cell count
    g = mx + 2
    mc = mx * c
    gc = g * c
    rs2, invd2 = model_consts
    n_newton = _newton_steps()
    uniform = uniform_params is not None
    names = ["x", "y", "z"]
    if not uniform:
        names += ["hs", "tse"]
    if coulomb is not None:
        names.append("q")
    if excl_e:
        names.append("aid")
    n_f = len(names)
    n_r = 5 if compute_energy else 3  # reaction rows: fx, fy, fz[, e, w]
    group_index = {grp: i for i, grp in enumerate(_HS_ROW_GROUPS)}

    def kernel(*refs):
        ghost_refs = refs[: 5 * n_f]
        centers = refs[5 * n_f]
        # Constant tiles arrive as inputs with a constant index map — Pallas
        # DMAs them once and reuses the same VMEM block every program.
        # (Building them in-kernel costs ~10⁵ iota/compare VPU ops per
        # program; at 1M atoms that was a measurable slice of the streaming
        # kernel's +28% per-atom gap vs the resident kernel.)
        is_self, expand, seg_bf16 = (
            refs[5 * n_f + 1][...], refs[5 * n_f + 2][...], refs[5 * n_f + 3],
        )
        outs = refs[5 * n_f + 4 :]
        fx, fy, fz = outs[:3]
        ro = outs[3:8]  # 5 reaction row groups, each (1, n_r, G·C)
        if compute_energy:
            e_out, w_out = outs[8:10]

        mm = lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )

        def segsum(t):
            sb = seg_bf16[...]
            hi = t.astype(jnp.bfloat16)
            rem = t - hi.astype(jnp.float32)
            mid = rem.astype(jnp.bfloat16)
            lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            out = jnp.dot(hi, sb, preferred_element_type=jnp.float32)
            out += jnp.dot(mid, sb, preferred_element_type=jnp.float32)
            out += jnp.dot(lo, sb, preferred_element_type=jnp.float32)
            return out

        # ONE batched center expansion for every field: (nC, M·C).
        n_cen_c = centers.shape[1]
        cen_alls = mm(centers[...].reshape(n_cen_c, m), expand)

        n_fields = 5 if compute_energy else 3
        cen = _unpack_centers(
            cen_alls, c, uniform, coulomb is not None, excl_e, excl_cs,
            excl_eb=excl_eb, bond_energy=compute_energy,
        )

        def load(name, dz, dy, win):
            fi = names.index(name)
            return ghost_refs[fi * 5 + group_index[(dz, dy)]][
                0, 0, 0:1, pl.ds(win, mc)
            ]

        pair_pass = _build_pair_pass(
            c=c, mc=mc, gc=gc, rs2=rs2, invd2=invd2, n_newton=n_newton,
            interpret=interpret, compute_energy=compute_energy,
            uniform_params=uniform_params, coulomb=coulomb,
            excl_e=excl_e, excl_cs=excl_cs, is_self=is_self,
            load=load, cen=cen, excl_eb=excl_eb,
        )

        zero_tile = jnp.zeros((c, mc), jnp.float32)
        acc = (zero_tile, zero_tile, zero_tile, zero_tile, zero_tile)
        acc, _ = pair_pass(0, 0, 0, True, acc)
        for grp in _HS_ROW_GROUPS:
            dz, dy = grp
            parts = []
            for dx in _HS_GROUP_DXS[grp]:
                acc, reaction = pair_pass(dz, dy, dx, False, acc)
                parts.append(reaction)
            combined = [sum(p[k] for p in parts) for k in range(len(parts[0]))]
            # Each program owns its row of every group output — plain
            # writes, no cross-program read-modify-write (HBM-safe).
            row = jnp.concatenate(combined, axis=0)
            if wrap_reaction:
                # Periodic x-fold in-register: ghost lane block gx=0 lands on
                # interior x=M-1, gx=G-1 on x=0 — the write shrinks to M·C
                # lanes and the XLA-side x-fold disappears.
                mid = row[:, c : c + mc]
                row = jnp.concatenate(
                    [
                        mid[:, :c] + row[:, (g - 1) * c :],
                        mid[:, c : (m - 1) * c],
                        mid[:, (m - 1) * c :] + row[:, :c],
                    ],
                    axis=1,
                )
            ro[group_index[grp]][0] = row

        reduced = segsum(jnp.concatenate(list(acc[:n_fields]), axis=0))
        # (An in-kernel reduced.T to hand the caller transpose-free center
        # outputs was tried and measured NET NEGATIVE at 1M atoms: the
        # per-program (n·C, M) Mosaic transpose cost ~0.4 ms/step, more than
        # the XLA-side relayout it removed.)
        fx[0] = reduced[0:c]
        fy[0] = reduced[c : 2 * c]
        fz[0] = reduced[2 * c : 3 * c]
        if compute_energy:
            e_out[0] = reduced[3 * c : 4 * c]
            w_out[0] = reduced[4 * c : 5 * c]

    return kernel


def streaming_halfshell_call(
    ghosts,
    centers,
    config: CellDenseConfig,
    dims,
    *,
    compute_energy: bool = False,
    interpret: bool = False,
    uniform_params=None,
    coulomb=None,
    excl_e: int = 0,
    excl_cs: bool = False,
    excl_eb: int = 0,
    wrap_reaction: bool = False,
):
    """Raw half-shell streaming pallas_call over the ghost fields.

    ghosts: one (Gz, Gy, (Mx+2)·C) ghosted array per field (x, y, z[, hs,
    tse][, q][, aid]); centers: the stacked (Mz·My, n·C, Mx) center block.
    dims = (mz, my, mx) interior cells.  Each ghost array is passed to the
    pallas_call five times with per-(dz, dy) block index maps — program
    (z, y) DMAs rows (z+dz+1, y+dy+1) straight from the single HBM copy, so
    no shifted row views are ever materialized.  Returns [fx, fy, fz, 5 ×
    reaction row groups (Mz·My, n_r, G·C) (+ e, w center outputs)]; the
    caller pads the groups back onto its ghost grid and folds (periodically
    on one chip, via reverse halo ppermute across shards).

    With wrap_reaction=True the reaction groups come back as (Mz·My, n_r,
    Mx·C) INTERIOR-aligned arrays: each program's row is written at the
    periodically wrapped (z+dz, y+dy) output row and its x-ghost lanes are
    folded in-register, so the caller only sums the five groups — no pads,
    no `_fold_ghosts`.  Single-chip full-box use only (a shard must keep its
    un-wrapped ghost rows for the reverse halo exchange)."""
    mz, my, mx = dims
    c = config.capacity
    g = mx + 2
    gc = g * c
    mc = mx * c
    rs2 = float(config.switch) ** 2
    rc2 = float(config.cutoff) ** 2
    invd2 = 1.0 / (rc2 - rs2)
    uniform = uniform_params is not None

    n_f = 3 + (0 if uniform else 2) + (0 if coulomb is None else 1) + (1 if excl_e else 0)
    n_cen = n_f - (1 if excl_e else 0) + excl_e * (3 if excl_cs else 2)
    n_cen += excl_eb * (3 if compute_energy else 2)
    n_r = 5 if compute_energy else 3
    n_rows = mz * my

    kernel = _make_streaming_kernel(
        config, (rs2, invd2), compute_energy, interpret,
        uniform_params=uniform_params, coulomb=coulomb,
        excl_e=excl_e, excl_cs=excl_cs, excl_eb=excl_eb, dims=dims,
        wrap_reaction=wrap_reaction,
    )

    def ghost_spec(dz, dy):
        return pl.BlockSpec(
            (1, 1, 1, gc),
            lambda i, dz=dz, dy=dy: (i // my + dz + 1, i % my + dy + 1, 0, 0),
            memory_space=pltpu.VMEM,
        )

    ghost_specs = [ghost_spec(dz, dy) for dz, dy in _HS_ROW_GROUPS]
    center_spec = pl.BlockSpec((1, n_cen * c, mx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec((c, mc), lambda i: (0, 0), memory_space=pltpu.VMEM),  # is_self
        pl.BlockSpec((mx, mc), lambda i: (0, 0), memory_space=pltpu.VMEM),  # expand
        pl.BlockSpec((mc, mx), lambda i: (0, 0), memory_space=pltpu.VMEM),  # seg bf16
    ]
    out_center = pl.BlockSpec((1, c, mx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if wrap_reaction:
        # Program (z, y)'s group-(dz, dy) reaction row is written straight at
        # the periodically wrapped interior row — the output arrays come back
        # interior-aligned (and x-folded to M·C lanes by the kernel).
        def react_spec(dz, dy):
            def at(i, dz=dz, dy=dy):
                z = jax.lax.rem(i // my + dz + mz, mz)
                y = jax.lax.rem(i % my + dy + my, my)
                return (z * my + y, 0, 0)

            return pl.BlockSpec((1, n_r, mc), at, memory_space=pltpu.VMEM)

        react_specs = [react_spec(dz, dy) for dz, dy in _HS_ROW_GROUPS]
        react_shape = jax.ShapeDtypeStruct((n_rows, n_r, mc), jnp.float32)
    else:
        out_react = pl.BlockSpec(
            (1, n_r, gc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        react_specs = [out_react] * 5
        react_shape = jax.ShapeDtypeStruct((n_rows, n_r, gc), jnp.float32)

    cen_shape = jax.ShapeDtypeStruct((n_rows, c, mx), jnp.float32)
    out_shapes = [cen_shape] * 3
    out_specs = [out_center] * 3
    out_shapes += [react_shape] * 5
    out_specs += react_specs
    if compute_energy:
        out_shapes += [cen_shape] * 2
        out_specs += [out_center] * 2

    call_kwargs = dict(
        grid=(n_rows,),
        in_specs=ghost_specs * n_f + [center_spec] + const_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
    )
    if interpret:
        call_kwargs["interpret"] = True
    else:
        call_kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        )
    inputs = [gh for gh in ghosts for _ in _HS_ROW_GROUPS]
    return pl.pallas_call(kernel, **call_kwargs)(*inputs, centers, *_const_tiles(mx, c))


@partial(
    jax.jit,
    static_argnames=("config", "compute_energy", "interpret", "uniform_params", "coulomb"),
)
def pallas_cell_forces_streaming(
    state: CellDenseState,
    model: LennardJonesModel,
    config: CellDenseConfig,
    *,
    compute_energy: bool = False,
    interpret: bool = False,
    uniform_params=None,
    coulomb=None,
    excl=None,
):
    """Streaming (HBM-fed) variant of `pallas_cell_forces` for any N.

    One grid program per (z, y) pencil; each program's five half-shell ghost
    neighborhood rows arrive as their own (1, G·C) blocks (Pallas pipelines
    the DMAs), so VMEM holds only a pencil's working set — no whole-problem
    residency requirement.  HALF-shell with Newton reaction rows: each
    program writes its reaction contributions as five per-(dz,dy) row groups
    (its own rows — no cross-program accumulation), which XLA pads back onto
    the ghost grid and folds, exactly like the resident kernel's reaction
    buffer but streamed.  Supports the full molecular feature set (DSF
    Coulomb + kernel-resident exclusion tags) via the shared pair-pass.
    """
    m, c = config.cells_per_dim, config.capacity
    g = m + 2
    gc = g * c

    uniform = uniform_params is not None
    if excl is not None and coulomb is not None and excl[2] is None:
        # Missing Coulomb scales default to the LJ scales — never skip them.
        excl = (excl[0], excl[1], excl[1]) + tuple(excl[3:])
    excl_e = 0 if excl is None else int(excl[0].shape[-1])
    excl_cs = excl is not None and excl[2] is not None
    bond = None if excl is None or len(excl) < 4 else excl[3]
    ghosts, centers = _prep_streaming_inputs(
        state, config, uniform=uniform,
        kc=0.0 if coulomb is None else coulomb[4], excl=excl,
        bond_energy=compute_energy,
    )
    outs = streaming_halfshell_call(
        ghosts, centers, config, (m, m, m),
        compute_energy=compute_energy, interpret=interpret,
        uniform_params=uniform_params, coulomb=coulomb,
        excl_e=excl_e, excl_cs=excl_cs,
        excl_eb=0 if bond is None else int(bond[0].shape[-1]),
        wrap_reaction=True,
    )

    def uncenter(a):  # (M², C, M) → (M³, C)
        return a.transpose(0, 2, 1).reshape(m**3, c)

    # wrap_reaction mode: the five groups arrive interior-aligned and
    # x-folded — summing them IS the periodic reaction fold.
    react_sum = sum(outs[3:8])

    def assemble(comp):
        return react_sum[:, comp, :].reshape(m**3, c)

    forces = jnp.stack(
        [uncenter(outs[0]) + assemble(0), uncenter(outs[1]) + assemble(1),
         uncenter(outs[2]) + assemble(2)], axis=-1,
    )
    if not compute_energy:
        return forces, None, None
    energies = uncenter(outs[8]) + assemble(3)
    virials = uncenter(outs[9]) + assemble(4)
    return forces, energies, virials


# ---------------------------------------------------------------------------
# Component-layout (split) wrappers — the scan-carry glue killers
# ---------------------------------------------------------------------------
#
# The r4 device trace (docs/PERF.md "profile stamp") measured 9.4% of the
# production step in XLA layout churn: the scan carry's (M³, C, 3) coordinate
# arrays hop three physical layouts before reaching the kernel operands, and
# the kernel's stacked (…, 3) force output hops back.  These wrappers take and
# return per-component (M³, C) arrays so a rollout can carry the state in the
# kernel-operand layout end to end — no (…, 3) stack/unstack inside the scan.
# Uniform-params fast path only (the pure-LJ fluid benchmarks); molecular
# systems keep the stacked-state entry points above.


@partial(jax.jit, static_argnames=("config", "interpret", "uniform_params"))
def pallas_cell_forces_split(
    px, py, pz, valid,
    config: CellDenseConfig,
    *,
    uniform_params,
    interpret: bool = False,
    box=None,
):
    """VMEM-resident kernel on component arrays: (M³, C) x/y/z + valid →
    (fx, fy, fz), each (M³, C).  Numerically identical to
    `pallas_cell_forces(..., uniform_params=...)` (same kernel, same operand
    values) — only the XLA-side packing differs."""
    m, c = config.cells_per_dim, config.capacity
    g = m + 2
    sbox = jnp.float32(config.box) if box is None else box
    far = _sentinel_far(config)
    sx = jnp.where(valid, px, far)
    sy = jnp.where(valid, py, far)
    sz = jnp.where(valid, pz, far)
    grid = lambda a: a.reshape(m, m, m, c)
    gx = _ghost(grid(sx), m, axis_shift=2, box=sbox).reshape(g * g, g * c)
    gy = _ghost(grid(sy), m, axis_shift=1, box=sbox).reshape(g * g, g * c)
    gz = _ghost(grid(sz), m, axis_shift=0, box=sbox).reshape(g * g, g * c)

    def center(a):
        return a.reshape(m * m, m, c).transpose(0, 2, 1)  # (M², C, M)

    centers = jnp.concatenate([center(sx), center(sy), center(sz)], axis=1)
    inputs = (gx, gy, gz, centers) + _const_tiles(m, c)
    outs = halfshell_call(
        inputs, config, (m, m, m),
        compute_energy=False, interpret=interpret,
        uniform_params=uniform_params,
    )

    def uncenter(a):  # (M², C, M) → (M³, C)
        return a.transpose(0, 2, 1).reshape(m**3, c)

    fx, fy, fz, react = outs
    react = react.reshape(3, g * g, g * c)
    return (
        uncenter(fx) + _fold_ghosts(react[0], m, c),
        uncenter(fy) + _fold_ghosts(react[1], m, c),
        uncenter(fz) + _fold_ghosts(react[2], m, c),
    )


@partial(jax.jit, static_argnames=("config", "uniform_params", "interpret"))
def pallas_cell_forces_streaming_split(
    px, py, pz, valid,
    config: CellDenseConfig,
    *,
    uniform_params,
    interpret: bool = False,
    box=None,
):
    """HBM-streaming kernel on component arrays (uniform-params fast path);
    see `pallas_cell_forces_split`.  Numerically identical to
    `pallas_cell_forces_streaming(..., uniform_params=...)`."""
    m, c = config.cells_per_dim, config.capacity
    g = m + 2
    sbox = jnp.float32(config.box) if box is None else box
    far = _sentinel_far(config)
    sx = jnp.where(valid, px, far)
    sy = jnp.where(valid, py, far)
    sz = jnp.where(valid, pz, far)
    grid = lambda a: a.reshape(m, m, m, c)
    ghosts = [
        _ghost(grid(sx), m, axis_shift=2, box=sbox).reshape(g, g, 1, g * c),
        _ghost(grid(sy), m, axis_shift=1, box=sbox).reshape(g, g, 1, g * c),
        _ghost(grid(sz), m, axis_shift=0, box=sbox).reshape(g, g, 1, g * c),
    ]

    def center(a):
        return a.reshape(m * m, m, c).transpose(0, 2, 1)

    centers = jnp.concatenate([center(sx), center(sy), center(sz)], axis=1)
    outs = streaming_halfshell_call(
        ghosts, centers, config, (m, m, m),
        compute_energy=False, interpret=interpret,
        uniform_params=uniform_params, wrap_reaction=True,
    )

    def uncenter(a):
        return a.transpose(0, 2, 1).reshape(m**3, c)

    react_sum = sum(outs[3:8])
    return (
        uncenter(outs[0]) + react_sum[:, 0, :].reshape(m**3, c),
        uncenter(outs[1]) + react_sum[:, 1, :].reshape(m**3, c),
        uncenter(outs[2]) + react_sum[:, 2, :].reshape(m**3, c),
    )
