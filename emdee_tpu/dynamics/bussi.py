"""Bussi–Donadio–Parrinello stochastic velocity rescaling (CSVR) NVT.

Beyond-reference capability (the reference has no integrator, SURVEY.md §0):
the canonical-sampling velocity-rescaling thermostat of Bussi, Donadio &
Parrinello (J. Chem. Phys. 126, 014101, 2007).  Unlike simple Berendsen
rescaling it samples the exact canonical distribution of the kinetic energy;
unlike Langevin it perturbs only the velocity MAGNITUDE (one global factor
per step), so dynamical properties such as diffusion are barely disturbed.

Per step: a velocity-Verlet NVE step, then one global rescale v ← α·v with

    α² = e^{-dt/τ} + (K̄/(Nf·K))·(1 − e^{-dt/τ})·(R₁² + Σ_{i=2}^{Nf} R_i²)
         + 2·e^{-dt/2τ}·R₁·√((K̄/(Nf·K))·(1 − e^{-dt/τ}))

where K is the instantaneous kinetic energy, K̄ = Nf·kT/2 the target, τ the
relaxation time, R_i standard normals; Σ R_i² over Nf−1 dofs is drawn from a
Gamma((Nf−1)/2, 2) distribution.  All on-device, keyed from the State's
carried PRNG — rollouts stay pure jitted functions.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from emdee_tpu.core.types import State
from emdee_tpu.dynamics.verlet import velocity_verlet_step


def _csvr_alpha2(key, kin, ndof, kT, dt, tau, dtype):
    """Bussi et al. (2007) eq. (A7): the squared rescaling factor."""
    c = jnp.exp(-jnp.asarray(dt, dtype) / jnp.asarray(tau, dtype))
    kbar = 0.5 * ndof * kT  # target kinetic energy
    k1, k2 = jax.random.split(key)
    r1 = jax.random.normal(k1, (), dtype)
    # Σ_{i=2..Nf} R_i² ~ Gamma((Nf−1)/2, scale 2) = 2·Gamma((Nf−1)/2).
    sum_r2 = 2.0 * jax.random.gamma(k2, 0.5 * (ndof - 1.0), dtype=dtype)
    factor = (1.0 - c) * kbar / (ndof * kin)
    alpha2 = c + factor * (r1 * r1 + sum_r2) + 2.0 * r1 * jnp.sqrt(c * factor)
    return alpha2


def bussi_step(
    state: State,
    forces: jax.Array,
    aux: Any,
    force_fn: Callable,
    dt,
    tau,
    temperature,
    kB: float = 1.0,
    com_fixed: bool = True,
) -> Tuple[State, jax.Array, Any]:
    """One velocity-Verlet step + CSVR global velocity rescale.

    com_fixed: velocity-Verlet conserves total momentum, and the standard
    velocity init zeroes it, so the center of mass carries no kinetic
    energy — the live dof count is 3N−3 (else the sampled temperature of
    the real dofs is biased high by 3N/(3N−3)).
    """
    if state.rng is None:
        raise ValueError("the Bussi thermostat needs a State with an rng key")
    dtype = state.positions.dtype
    kT = jnp.asarray(kB * temperature, dtype)
    n = state.positions.shape[0]
    ndof = jnp.asarray(3 * n - (3 if com_fixed else 0), dtype)

    state, forces, aux = velocity_verlet_step(state, forces, aux, force_fn, dt)

    kin = 0.5 * jnp.sum(state.masses[:, None] * state.velocities**2)
    key, sub = jax.random.split(state.rng)
    alpha2 = _csvr_alpha2(sub, jnp.maximum(kin, 1e-30), ndof, kT, dt, tau, dtype)
    alpha = jnp.sqrt(jnp.maximum(alpha2, 0.0))
    return (
        state._replace(velocities=alpha * state.velocities, rng=key),
        forces,
        aux,
    )


@partial(jax.jit, static_argnames=("force_fn", "num_steps"))
def csvr_rollout(
    state: State,
    aux: Any,
    force_fn: Callable,
    dt,
    tau,
    temperature,
    num_steps: int,
    kB: float = 1.0,
):
    """Scan `num_steps` Bussi CSVR steps on device."""
    forces0, aux = force_fn(state.positions, state.box, aux)

    def one_step(carry, _):
        st, f, ax = carry
        st, f, ax = bussi_step(st, f, ax, force_fn, dt, tau, temperature, kB)
        return (st, f, ax), None

    (state, _, aux), _ = jax.lax.scan(
        one_step, (state, forces0, aux), None, length=num_steps
    )
    return state, aux
