"""FIRE energy minimization (Bitzek et al., PRL 97, 170201, 2006).

Beyond-reference capability: structure relaxation before dynamics — the
standard preparation step every MD package ships and the reference lacks
(it has no integrator at all, SURVEY.md §0).  FIRE is molecular-dynamics
shaped (velocity-Verlet steps + inertial velocity mixing), so it reuses the
engine's force paths unchanged and jits into one `lax.scan`:

    P = F·v
    v ← (1−α)·v + α·|v|·F̂            (inertial steering)
    P > 0 for ≥ N_min steps:  dt ← min(dt·f_inc, dt_max), α ← α·f_α
    P ≤ 0:                    v ← 0, dt ← dt·f_dec, α ← α_start

All state (dt, α, the uphill counter) is carried through the scan, so the
whole minimization is a single device program with static iteration count —
convergence is read off the returned max-|F| history.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from emdee_tpu.core.pbc import wrap
from emdee_tpu.core.types import State


class FireConfig(NamedTuple):
    dt_start: float = 0.002
    dt_max: float = 0.02
    n_min: int = 5
    f_inc: float = 1.1
    f_dec: float = 0.5
    alpha_start: float = 0.1
    f_alpha: float = 0.99


@partial(jax.jit, static_argnames=("force_fn", "num_steps", "config"))
def fire_minimize(
    state: State,
    aux: Any,
    force_fn: Callable,
    num_steps: int,
    config: FireConfig = FireConfig(),
) -> Tuple[State, Any, jax.Array]:
    """Relax `state` for `num_steps` FIRE iterations.

    Returns (state at the BEST-visited configuration — FIRE's inertial
    dynamics overshoot near convergence, so the minimum-|F| snapshot is the
    answer, not the last step — with zero velocities, aux, and the per-step
    max-|F| history); check `history.min()` against your force tolerance.
    """
    dtype = state.positions.dtype
    inv_m = (1.0 / state.masses)[:, None]
    forces0, aux = force_fn(state.positions, state.box, aux)

    def step(carry, _):
        st, f, ax, dt, alpha, n_up, best_pos, best_f = carry
        # Semi-implicit Euler MD step (velocities start at/near zero, so the
        # VV half-kick refinement buys nothing here).
        v = st.velocities + dt * f * inv_m
        # FIRE steering.
        p = jnp.sum(f * v)
        v_norm = jnp.sqrt(jnp.sum(v * v))
        f_norm = jnp.sqrt(jnp.sum(f * f))
        v_steer = (1.0 - alpha) * v + alpha * v_norm * f / jnp.maximum(f_norm, 1e-30)
        uphill = p <= 0.0
        v = jnp.where(uphill, jnp.zeros_like(v), v_steer)
        n_up = jnp.where(uphill, 0, n_up + 1)
        grow = (~uphill) & (n_up > config.n_min)
        dt = jnp.where(
            uphill,
            dt * config.f_dec,
            jnp.where(grow, jnp.minimum(dt * config.f_inc, config.dt_max), dt),
        )
        alpha = jnp.where(
            uphill,
            jnp.asarray(config.alpha_start, dtype),
            jnp.where(grow, alpha * config.f_alpha, alpha),
        )
        x = wrap(st.positions + dt * v, st.box)
        f_new, ax = force_fn(x, st.box, ax)
        st = st._replace(positions=x, velocities=v)
        fmax = jnp.max(jnp.abs(f_new))
        better = fmax < best_f
        best_pos = jnp.where(better, x, best_pos)
        best_f = jnp.where(better, fmax, best_f)
        return (st, f_new, ax, dt, alpha, n_up, best_pos, best_f), fmax

    carry = (
        state._replace(velocities=jnp.zeros_like(state.velocities)),
        forces0, aux,
        jnp.asarray(config.dt_start, dtype),
        jnp.asarray(config.alpha_start, dtype),
        jnp.asarray(0, jnp.int32),
        state.positions,
        jnp.max(jnp.abs(forces0)),
    )
    (st, f, aux, dt, alpha, n_up, best_pos, best_f), history = jax.lax.scan(
        step, carry, None, length=num_steps
    )
    # The minimizer may have wandered beyond the neighbor skin between the
    # best-visited and final configurations; one extra force_fn call rebinds
    # aux (neighbor/cell state) to the positions actually returned.
    _, aux = force_fn(best_pos, st.box, aux)
    return (
        st._replace(positions=best_pos, velocities=jnp.zeros_like(st.velocities)),
        aux,
        history,
    )
