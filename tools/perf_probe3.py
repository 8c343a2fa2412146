"""VPU roofline probe: marginal cost of elementwise ops in a Pallas kernel.

Runs a synthetic kernel shaped exactly like the pair-force kernel's hot loop
(grid of 289 programs, 14 tiles of (C, M*C) per program) but with the pair
math replaced by a chain of K fmas.  Sweeping K separates the per-op ALU
cost (slope) from fixed per-tile/per-program overhead (intercept), giving
the v5e VPU's sustainable ops/cycle for this dispatch shape.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def run(k_ops: int, c: int = 32, m: int = 17, tiles: int = 14, iters: int = 200):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mc = m * c
    g = m + 2

    def kernel(ghost, centers, out):
        i = pl.program_id(0)
        cz = i // m
        cy = i - cz * m
        acc = jnp.zeros((c, mc), jnp.float32)
        cen = centers[0]
        for t in range(tiles):
            row = (cz + (t % 3)) * g + (cy + (t // 3) % 3)
            win = (t % 3) * c
            nb = ghost[pl.ds(row, 1), pl.ds(win, mc)]
            x = cen - nb
            for _ in range(k_ops):
                x = x * 0.9999999 + 0.0000001
            acc += x
        out[0] = acc

    ghost = jnp.ones((g * g, g * c), jnp.float32)
    centers = jax.random.uniform(jax.random.PRNGKey(0), (m * m, c, mc), jnp.float32)

    ghost_spec = pl.BlockSpec((g * g, g * c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    center_spec = pl.BlockSpec((1, c, mc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, c, mc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def call(ghost, centers):
        return pl.pallas_call(
            kernel,
            grid=(m * m,),
            in_specs=[ghost_spec, center_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((m * m, c, mc), jnp.float32),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(ghost, centers)

    @jax.jit
    def loop(ghost, centers):
        def body(g2, _):
            o = call(ghost, g2)
            return jnp.roll(o, 1, axis=0) * 0.999 + 0.001, None
        o, _ = jax.lax.scan(body, centers, None, length=iters)
        return o

    o = loop(ghost, centers)
    _ = np.asarray(o[0, 0, 0])
    o = loop(ghost, o)
    _ = np.asarray(o[0, 0, 0])
    t0 = time.perf_counter()
    o = loop(ghost, o)
    _ = np.asarray(o[0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    pair_lanes = m * m * tiles * c * mc
    flops = pair_lanes * (2 * k_ops + 2)
    print(
        json.dumps(
            {
                "k_ops": k_ops,
                "ms": round(1e3 * dt, 4),
                "pair_lanes": pair_lanes,
                "ns_per_tile": round(1e9 * dt / (m * m * tiles), 2),
                "eff_Gops": round(flops / dt / 1e9, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    for k in [int(a) for a in (sys.argv[1:] or ["5", "15", "25", "45"])]:
        run(k)
