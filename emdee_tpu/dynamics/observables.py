"""Simulation observables: kinetic/potential energy, temperature, pressure.

The reference computes per-atom energies and scalar virials but never derives
thermodynamic observables from them (SURVEY.md §5 — no metrics/logging).
Conventions: total potential = Σᵢ energyᵢ, total scalar virial W = Σᵢ
virialᵢ = Σ_pairs (−r·dE/dr) (nonbonded.jl:93-94,102-103).
"""

from __future__ import annotations

import jax.numpy as jnp

from emdee_tpu.core.types import State


def kinetic_energy(state: State) -> jnp.ndarray:
    return 0.5 * jnp.sum(state.masses[:, None] * state.velocities**2)


def temperature(state: State, kB: float = 1.0) -> jnp.ndarray:
    """Instantaneous T from equipartition: 2·E_kin / (3N·kB) (LJ units: kB=1)."""
    n = state.positions.shape[0]
    return 2.0 * kinetic_energy(state) / (3.0 * n * kB)


def pressure(state: State, total_virial, kB: float = 1.0) -> jnp.ndarray:
    """Isotropic virial pressure: P = (N·kB·T + W/3) / V with W = Σ(−r·E′)."""
    n = state.positions.shape[0]
    volume = state.box**3
    return (n * kB * temperature(state, kB) + total_virial / 3.0) / volume


def total_energy(state: State, potential_energy) -> jnp.ndarray:
    return kinetic_energy(state) + potential_energy


def energy_drift(total_energies: jnp.ndarray) -> jnp.ndarray:
    """Relative NVE drift: max |E(t) − E(0)| / |E(0)| over a rollout record."""
    e0 = total_energies[0]
    return jnp.max(jnp.abs(total_energies - e0)) / jnp.abs(e0)
