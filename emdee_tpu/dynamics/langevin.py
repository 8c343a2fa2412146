"""Langevin (NVT) integration — BAOAB splitting.

Beyond-reference capability (the reference has no integrator at all): the
BAOAB scheme of Leimkuhler & Matthews, the standard high-accuracy Langevin
splitting — kick (B), drift (A), Ornstein-Uhlenbeck exact solve (O), drift
(A), kick (B).  Noise comes from the State's carried PRNG key, so rollouts
remain pure functions jitted end-to-end.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from emdee_tpu.core.pbc import wrap
from emdee_tpu.core.types import State


def langevin_baoab_step(
    state: State,
    forces: jax.Array,
    aux: Any,
    force_fn: Callable,
    dt,
    friction,
    temperature,
    kB: float = 1.0,
) -> Tuple[State, jax.Array, Any]:
    if state.rng is None:
        raise ValueError("Langevin dynamics needs a State with an rng key")
    dtype = state.positions.dtype
    dt = jnp.asarray(dt, dtype)
    gamma = jnp.asarray(friction, dtype)
    kT = jnp.asarray(kB * temperature, dtype)
    inv_m = (1.0 / state.masses)[:, None]

    # B: half kick
    v = state.velocities + 0.5 * dt * forces * inv_m
    # A: half drift
    x = state.positions + 0.5 * dt * v
    # O: exact OU update
    c1 = jnp.exp(-gamma * dt)
    c2 = jnp.sqrt((1.0 - c1 * c1) * kT) * jnp.sqrt(inv_m)
    key, sub = jax.random.split(state.rng)
    noise = jax.random.normal(sub, state.velocities.shape, dtype)
    v = c1 * v + c2 * noise
    # A: half drift
    x = wrap(x + 0.5 * dt * v, state.box)
    # B: half kick with new forces
    new_forces, aux = force_fn(x, state.box, aux)
    v = v + 0.5 * dt * new_forces * inv_m

    new_state = state._replace(
        positions=x, velocities=v, step=state.step + 1, rng=key
    )
    return new_state, new_forces, aux


@partial(
    jax.jit, static_argnames=("force_fn", "num_steps", "record_every", "energy_fn")
)
def nvt_rollout(
    state: State,
    aux: Any,
    force_fn: Callable,
    dt,
    friction,
    temperature,
    num_steps: int,
    record_every: int = 0,
    energy_fn=None,
    kB: float = 1.0,
):
    """Scan `num_steps` BAOAB steps on device (same contract as nve_rollout)."""
    from emdee_tpu.dynamics.verlet import Trajectory, kinetic_energy

    forces0, aux = force_fn(state.positions, state.box, aux)

    def one_step(carry, _):
        st, f, ax = carry
        st, f, ax = langevin_baoab_step(
            st, f, ax, force_fn, dt, friction, temperature, kB
        )
        return (st, f, ax), None

    if record_every <= 0:
        (state, _, aux), _ = jax.lax.scan(
            one_step, (state, forces0, aux), None, length=num_steps
        )
        return state, aux, None

    num_records, rem = divmod(num_steps, record_every)
    if rem:
        raise ValueError("num_steps must be a multiple of record_every")

    def one_record(carry, _):
        carry, _ = jax.lax.scan(one_step, carry, None, length=record_every)
        st, _, ax = carry
        ke = kinetic_energy(st)
        pe = vir = None
        if energy_fn is not None:
            pe, vir = energy_fn(st.positions, ax)
        return carry, Trajectory(st.step, ke, pe, vir)

    (state, _, aux), traj = jax.lax.scan(
        one_record, (state, forces0, aux), None, length=num_records
    )
    return state, aux, traj
