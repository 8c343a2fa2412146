"""Bonded potentials: harmonic bonds, harmonic angles, periodic torsions.

The reference parses these tables from force-field XML (HARMONIC_BOND /
HARMONIC_ANGLE / PERIODIC_TORSION schemas, modelling.jl:46-69) but never
evaluates them (SURVEY.md §0).  This module completes the feature: energies
as pure jnp functions of positions; forces come from `jax.grad` — exact,
fused by XLA into the step, and free of hand-derived vector calculus.

Functional forms (OpenMM conventions, matching the XML units):
  bond:    E = ½ k (r − r₀)²
  angle:   E = ½ k (θ − θ₀)²
  torsion: E = Σ_n k_n (1 + cos(n φ − φ₀_n))

All terms take padded static-shape index arrays with a validity mask, so
they jit/scan like everything else.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from emdee_tpu.core.pbc import minimum_image


class BondTable(NamedTuple):
    atoms: jax.Array  # (B, 2) int32, pad rows = N
    length: jax.Array  # (B,) float32 r0
    k: jax.Array  # (B,) float32
    valid: jax.Array  # (B,) bool


class AngleTable(NamedTuple):
    atoms: jax.Array  # (A, 3) int32 — i, j (apex), k
    theta0: jax.Array  # (A,) float32 radians
    k: jax.Array  # (A,) float32
    valid: jax.Array  # (A,) bool


class TorsionTable(NamedTuple):
    atoms: jax.Array  # (T, 4) int32 — i, j, k, l
    periodicity: jax.Array  # (T, P) int32
    phase: jax.Array  # (T, P) float32 radians
    k: jax.Array  # (T, P) float32 (0 for unused terms)
    valid: jax.Array  # (T,) bool


def _disp(positions, box, i, j):
    return box * minimum_image((positions[i] - positions[j]) / box)


def bond_energy(positions, box, table: BondTable):
    n = positions.shape[0]
    i = jnp.minimum(table.atoms[:, 0], n - 1)
    j = jnp.minimum(table.atoms[:, 1], n - 1)
    rv = _disp(positions, box, i, j)
    r = jnp.sqrt(jnp.sum(rv * rv, axis=-1) + 1e-30)
    e = 0.5 * table.k * (r - table.length) ** 2
    return jnp.sum(jnp.where(table.valid, e, 0.0))


def angle_energy(positions, box, table: AngleTable):
    n = positions.shape[0]
    i = jnp.minimum(table.atoms[:, 0], n - 1)
    j = jnp.minimum(table.atoms[:, 1], n - 1)
    k = jnp.minimum(table.atoms[:, 2], n - 1)
    a = _disp(positions, box, i, j)
    b = _disp(positions, box, k, j)
    cos_t = jnp.sum(a * b, axis=-1) / jnp.sqrt(
        jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1) + 1e-30
    )
    theta = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
    e = 0.5 * table.k * (theta - table.theta0) ** 2
    return jnp.sum(jnp.where(table.valid, e, 0.0))


def torsion_energy(positions, box, table: TorsionTable):
    n = positions.shape[0]
    ii = jnp.minimum(table.atoms[:, 0], n - 1)
    jj = jnp.minimum(table.atoms[:, 1], n - 1)
    kk = jnp.minimum(table.atoms[:, 2], n - 1)
    ll = jnp.minimum(table.atoms[:, 3], n - 1)
    b1 = _disp(positions, box, jj, ii)
    b2 = _disp(positions, box, kk, jj)
    b3 = _disp(positions, box, ll, kk)
    # Pad rows clip every index to the same atom → b's of zero → 0/0 and
    # arctan2(0, 0), whose NaN PARTIALS poison jax.grad even though the
    # energy itself is `valid`-masked (0·NaN = NaN in the chain rule).
    # Substitute a non-degenerate frame for invalid rows before any math.
    val = table.valid[:, None]
    b1 = jnp.where(val, b1, jnp.asarray([1.0, 0.0, 0.0], b1.dtype))
    b2 = jnp.where(val, b2, jnp.asarray([0.0, 1.0, 0.0], b2.dtype))
    b3 = jnp.where(val, b3, jnp.asarray([0.0, 0.0, 1.0], b3.dtype))
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(
        n1, b2 / jnp.sqrt(jnp.sum(b2 * b2, axis=-1, keepdims=True) + 1e-30)
    )
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    phi = jnp.arctan2(y, x)  # (T,)
    e_terms = table.k * (
        1.0 + jnp.cos(table.periodicity * phi[:, None] - table.phase)
    )  # (T, P)
    e = jnp.sum(e_terms, axis=-1)
    return jnp.sum(jnp.where(table.valid, e, 0.0))


def bond_virial(positions, box, table: BondTable):
    """Scalar bond virial Σ −r·dE/dr = Σ −k·r·(r − r₀) (the engine's pair
    convention, so P = (2K + W)/(3V) stays exact with bonded terms)."""
    n = positions.shape[0]
    i = jnp.minimum(table.atoms[:, 0], n - 1)
    j = jnp.minimum(table.atoms[:, 1], n - 1)
    rv = _disp(positions, box, i, j)
    r = jnp.sqrt(jnp.sum(rv * rv, axis=-1) + 1e-30)
    w = -table.k * r * (r - table.length)
    return jnp.sum(jnp.where(table.valid, w, 0.0))


class BondedSystem(NamedTuple):
    """All bonded terms of a typed system (static-shape tables)."""

    bonds: Optional[BondTable]
    angles: Optional[AngleTable]
    torsions: Optional[TorsionTable]
    impropers: Optional[TorsionTable]

    def energy(self, positions, box):
        e = jnp.asarray(0.0, positions.dtype)
        if self.bonds is not None:
            e = e + bond_energy(positions, box, self.bonds)
        if self.angles is not None:
            e = e + angle_energy(positions, box, self.angles)
        if self.torsions is not None:
            e = e + torsion_energy(positions, box, self.torsions)
        if self.impropers is not None:
            e = e + torsion_energy(positions, box, self.impropers)
        return e

    def virial(self, positions, box):
        """Total scalar virial of the bonded terms.

        Angles and torsions are functions of ANGLES only, which are invariant
        under isotropic scaling of all coordinates — their virial is exactly
        zero; only the bond-length terms contribute."""
        w = jnp.asarray(0.0, positions.dtype)
        if self.bonds is not None:
            w = w + bond_virial(positions, box, self.bonds)
        return w

    def force_fn(self):
        """forces(positions, box) = −∇E, via autodiff (exact)."""
        grad = jax.grad(lambda p, b: self.energy(p, b))

        def forces(positions, box):
            return -grad(positions, box)

        return forces

    def remap(self, index_map):
        """Tables with every atom index mapped through `index_map` (e.g. the
        per-rebin atom→slot binding; pad rows map through index_map's last
        row).  Parameters and validity are shared, not copied."""
        re = lambda t: None if t is None else t._replace(
            atoms=index_map[jnp.minimum(t.atoms, index_map.shape[0] - 1)]
        )
        return BondedSystem(
            bonds=re(self.bonds), angles=re(self.angles),
            torsions=re(self.torsions), impropers=re(self.impropers),
        )
