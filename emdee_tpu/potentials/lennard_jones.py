"""Switched 12-6 Lennard-Jones pair potential.

Reproduces the reference's pair math (lennard_jones.jl:25-42) as a pure,
vectorizable JAX function of squared distance:

    σᵢⱼ  = half_sigma_i + half_sigma_j              (Lorentz mixing)
    4εᵢⱼ = twice_sqrt_eps_i · twice_sqrt_eps_j       (Berthelot mixing)
    s⁻²  = σᵢⱼ² / r²,   s⁻⁶ = (s⁻²)³
    E    = 4εᵢⱼ s⁻⁶ (s⁻⁶ − 1)
    −r·E′ = 24εᵢⱼ s⁻⁶ (2s⁻⁶ − 1)

with a quintic switching function applied in the r² domain
(lennard_jones.jl:36-41):

    x = (r² − rs²) / (rc² − rs²)        (clamped to [0, 1])
    g(x) = 1 − 10x³ + 15x⁴ − 6x⁵        (g(0)=1, g(1)=0, g′(0)=g′(1)=0)
    returns (E·g,  (−r·E′)·g + E·(−r·g′))  with  −r·g′ = 60x²(1−x)²·δ⁻²·r²

Cutoff semantics — two modes:

- ``parity_mode=True`` reproduces the reference bit-for-bit, including its
  behavioral quirk: the clamp is implemented as ``x *= 0.5(sign(x)−sign(x−1))``
  which maps x>1 (r>rc) back to x=0 ⇒ g=1, so pairs beyond the cutoff still
  interact at full strength, and the kernel applies no r²≤rc² test at all
  (nonbonded.jl:67-86).  Use only for differential gating against the
  reference's all-pairs oracle.
- ``parity_mode=False`` (engine default) enforces a true smooth cutoff:
  x = clip(x, 0, 1) so g ≡ 0 and g′ ≡ 0 for r ≥ rc; energies and forces vanish
  smoothly at the cutoff, as a neighbor-listed production engine requires.

All math is float32 on device, matching the reference (vec3.jl:3-7).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from emdee_tpu.core.types import LJParams


class LennardJonesModel(NamedTuple):
    """Global LJ model constants, pre-squared like the reference
    (lennard_jones.jl:6-11): rc², rs², δ⁻² = 1/(rc²−rs²)."""

    rc2: jax.Array
    rs2: jax.Array
    inv_delta2: jax.Array

    @classmethod
    def create(cls, cutoff: float, switch: float, dtype=jnp.float32):
        rc2 = jnp.asarray(cutoff, dtype) ** 2
        rs2 = jnp.asarray(switch, dtype) ** 2
        return cls(rc2=rc2, rs2=rs2, inv_delta2=1.0 / (rc2 - rs2))

    @property
    def cutoff(self):
        return jnp.sqrt(self.rc2)


def lennard_jones_atom(epsilon, sigma, dtype=jnp.float32) -> LJParams:
    """Pre-transform (ε, σ) into mixing-ready per-atom params (σ/2, 2√ε)
    (lennard_jones.jl:13)."""
    epsilon = jnp.asarray(epsilon, dtype)
    sigma = jnp.asarray(sigma, dtype)
    return LJParams(
        half_sigma=jnp.atleast_1d(0.5 * sigma),
        twice_sqrt_eps=jnp.atleast_1d(2.0 * jnp.sqrt(epsilon)),
    )


def pair_interaction(
    r2: jax.Array,
    model: LennardJonesModel,
    half_sigma_i: jax.Array,
    twice_sqrt_eps_i: jax.Array,
    half_sigma_j: jax.Array,
    twice_sqrt_eps_j: jax.Array,
    *,
    parity_mode: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Pair energy and −r·dE/dr at squared distance r².

    Broadcasts over any leading shape.  Callers are responsible for masking
    invalid pairs (self-pairs, padding) — pass a safe nonzero r² for those and
    zero out the outputs.
    """
    dt = r2.dtype
    sigma = half_sigma_i + half_sigma_j
    eps4 = twice_sqrt_eps_i * twice_sqrt_eps_j
    s2inv = sigma * sigma / r2
    s6inv = s2inv * s2inv * s2inv
    eps4_s6 = eps4 * s6inv
    energy = eps4_s6 * (s6inv - 1.0)
    minus_rE = 6.0 * eps4_s6 * (2.0 * s6inv - 1.0)

    x = (r2 - model.rs2) * model.inv_delta2
    if parity_mode:
        # Reference clamp quirk (lennard_jones.jl:37): x<0 → 0, 0<x<1 → x,
        # x>1 → 0 (so g=1 beyond the cutoff).
        x = x * (0.5 * (jnp.sign(x) - jnp.sign(x - 1.0))).astype(dt)
    else:
        x = jnp.clip(x, 0.0, 1.0)
    x2 = x * x
    g = 1.0 + x * x2 * (15.0 * x - 6.0 * x2 - 10.0)
    one_minus_x = 1.0 - x
    minus_rg = 60.0 * x2 * (one_minus_x * one_minus_x) * model.inv_delta2 * r2
    return energy * g, minus_rE * g + energy * minus_rg


def pair_energy(r2, model, params_i: LJParams, params_j: LJParams, **kw):
    """Convenience wrapper taking LJParams tuples."""
    return pair_interaction(
        r2,
        model,
        params_i.half_sigma,
        params_i.twice_sqrt_eps,
        params_j.half_sigma,
        params_j.twice_sqrt_eps,
        **kw,
    )
