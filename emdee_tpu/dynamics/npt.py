"""Berendsen pressure coupling (NPT) for the portable force paths.

Beyond-reference capability (the reference has no integrator at all,
SURVEY.md §0): weak-coupling barostat (Berendsen et al. 1984) layered over
any thermostatted step — each step the box and positions are rescaled by

    μ = (1 − (dt/τ_P)·κ·(P₀ − P))^{1/3},   P = (2·KE + W) / (3V)

with W = Σ_pairs (−r·dE/dr) the scalar virial (the engine's per-atom
half-split convention sums to exactly this).  Weak coupling does not sample
a rigorous NPT ensemble (use it for equilibration / density relaxation, the
standard practice); the instantaneous-pressure plumbing is the reusable
part.

Works with the box-dynamic force paths (all-pairs; any force_fn that takes
the box as a traced operand).  The cell-based engines have static geometry
(cells_per_dim, capacity are compile-time) and would need re-binning per box
change — run NVT/NVE there and equilibrate density here first.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from emdee_tpu.core.types import ENERGIES, VIRIALS, State


def instantaneous_pressure(state: State, virial_total) -> jax.Array:
    """P = (2·KE + W) / (3V) — isotropic virial pressure."""
    ke = 0.5 * jnp.sum(state.masses[:, None] * state.velocities**2)
    vol = state.box**3
    return (2.0 * ke + virial_total) / (3.0 * vol)


def berendsen_npt_step(
    state: State,
    forces: jax.Array,
    aux: Any,
    force_fn: Callable,
    virial_fn: Callable,  # (positions, box, aux) → total scalar virial
    dt,
    tau_p,
    pressure,
    kappa: float = 1.0,  # isothermal compressibility (units of 1/P)
    thermostat_step: Callable = None,
) -> Tuple[State, jax.Array, Any]:
    """One (thermostatted) step + Berendsen box/position rescale.

    Note: virial_fn is a second pair evaluation per step; for long NPT runs
    fold the virial into force_fn's outputs (FORCES|VIRIALS in one pass,
    carried through `aux`) — kept separate here for force_fn-compatibility
    with every existing path.
    """
    from emdee_tpu.dynamics.verlet import velocity_verlet_step

    step_fn = thermostat_step or velocity_verlet_step
    state, forces, aux = step_fn(state, forces, aux, force_fn, dt)

    w = virial_fn(state.positions, state.box, aux)
    p_inst = instantaneous_pressure(state, w)
    dtype = state.positions.dtype
    mu3 = 1.0 - (jnp.asarray(dt, dtype) / jnp.asarray(tau_p, dtype)) * (
        jnp.asarray(kappa, dtype) * (jnp.asarray(pressure, dtype) - p_inst)
    )
    # Clamp per-step rescale to ±10% volume — weak coupling far from the
    # target pressure must not implode/explode the box in one step.
    mu = jnp.clip(mu3, 0.9, 1.1) ** (1.0 / 3.0)
    return (
        state._replace(positions=state.positions * mu, box=state.box * mu),
        forces,
        aux,
    )


@partial(
    jax.jit,
    static_argnames=("force_fn", "virial_fn", "num_steps", "thermostat_step"),
)
def npt_rollout(
    state: State,
    aux: Any,
    force_fn: Callable,
    virial_fn: Callable,
    dt,
    tau_p,
    pressure,
    num_steps: int,
    kappa: float = 1.0,
    thermostat_step: Callable = None,
):
    """Scan `num_steps` Berendsen-coupled steps on device."""
    forces0, aux = force_fn(state.positions, state.box, aux)

    def one_step(carry, _):
        st, f, ax = carry
        st, f, ax = berendsen_npt_step(
            st, f, ax, force_fn, virial_fn, dt, tau_p, pressure, kappa,
            thermostat_step,
        )
        return (st, f, ax), st.box

    (state, _, aux), boxes = jax.lax.scan(
        one_step, (state, forces0, aux), None, length=num_steps
    )
    return state, aux, boxes
