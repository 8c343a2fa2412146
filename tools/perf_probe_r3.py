"""Round-3 perf probes: split pallas_cell_forces into kernel vs XLA-prep
cost, and time rebin variants.

All loops keep inputs genuinely evolving (axon dedups identical dispatches).
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_probe_r3.py <variants>
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

from tools.perf_probe2 import setup


def kernel_only(iters=400):
    """Time the raw halfshell_call with pre-built inputs (no ghost build, no
    center transpose, no fold): force_only − kernel_only = XLA prep+fold."""
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.pallas_cell_kernel import (
        _prep_inputs,
        halfshell_call,
    )

    state, config, model, n = setup(capacity=32)
    m = config.cells_per_dim
    rs2 = float(config.switch) ** 2
    rc2 = float(config.cutoff) ** 2
    up = (0.5, 2.0)
    inputs = _prep_inputs(state, config, uniform=True)

    @jax.jit
    def scan_kernel(inputs):
        def body(carry, i):
            ins = carry
            outs = halfshell_call(
                ins, config, (m, m, m), uniform_params=up,
            )
            # evolve: nudge the coordinate ghosts by a tiny output-dependent
            # amount so no two dispatches are identical
            eps = 1e-12 * outs[0][0, 0, 0]
            ins = tuple(
                (f + eps if k < 3 else f) for k, f in enumerate(ins)
            )
            return ins, None

        ins, _ = jax.lax.scan(body, inputs, jnp.arange(iters))
        return ins

    out = scan_kernel(inputs)
    jax.block_until_ready(out[0])
    out = scan_kernel(out)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = scan_kernel(out)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": "kernel_only_c32", "ms_per_call": round(1e3 * dt, 4)}), flush=True)


def prep_only(iters=400):
    """Time _prep_inputs + fold-shaped consumption without the kernel."""
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.pallas_cell_kernel import _prep_inputs

    state, config, model, n = setup(capacity=32)

    @jax.jit
    def scan_prep(st):
        def body(carry, i):
            st = carry
            ins = _prep_inputs(st, config, uniform=True)
            # consume all outputs so nothing is DCE'd; tiny dependent update
            tot = sum(jnp.sum(f[:1, :8]) for f in ins[:3])
            st = st._replace(positions=st.positions + 1e-12 * tot)
            return st, None

        st, _ = jax.lax.scan(body, st, jnp.arange(iters))
        return st

    out = scan_prep(state)
    jax.block_until_ready(out.positions)
    out = scan_prep(out)
    jax.block_until_ready(out.positions)
    t0 = time.perf_counter()
    out = scan_prep(out)
    jax.block_until_ready(out.positions)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": "prep_only_c32", "ms_per_call": round(1e3 * dt, 4)}), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["kernel_only", "prep_only"]
    for w in which:
        if w == "kernel_only":
            kernel_only()
        elif w == "prep_only":
            prep_only()
