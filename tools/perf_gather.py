"""TPU row-gather/scatter rate probe: what does a bonded-term row actually
cost as a function of payload width and index pattern?

The molecular step's remaining wall is ~240k gather + scatter rows per step
(angles/torsions after in-kernel bond absorption) at an assumed ~9 ns/row.
This probe measures that rate directly — random vs sorted indices, widths
3/8, gather vs scatter-add vs unique-index scatter — to decide whether the
angle path can be cheapened by packing/sorting or only by removing rows.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_gather.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def timed(name, fn, x, iters=50):
    import jax

    @jax.jit
    def scan(x):
        def body(c, _):
            return fn(c), None

        c, _ = jax.lax.scan(body, x, jax.numpy.arange(iters))
        return c

    out = scan(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = scan(out)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"variant": name, "ms": round(ms, 4)}), flush=True)
    return ms


def main(ns=140_000, rows=120_000):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    idx_rand = jnp.asarray(rng.integers(0, ns, rows), jnp.int32)
    idx_sort = jnp.sort(idx_rand)
    idx_perm = jnp.asarray(rng.permutation(ns)[:rows], jnp.int32)

    for w in (3, 8):
        pos = jnp.asarray(rng.standard_normal((ns, w)), jnp.float32)

        def gathered(p, i):
            # Keep the carry shape: fold the gathered rows into a scalar nudge.
            return p + 1e-12 * jnp.sum(p.at[i].get())

        timed(f"gather_rand_w{w}", lambda p, i=idx_rand: gathered(p, i), pos)
        timed(f"gather_sort_w{w}", lambda p, i=idx_sort: gathered(p, i), pos)

        contrib = jnp.asarray(rng.standard_normal((rows, w)), jnp.float32)

        def scat_add(p, i):
            return p * 0.999999 + jnp.zeros_like(p).at[i].add(contrib)

        timed(f"scatter_add_rand_w{w}", lambda p, i=idx_rand: scat_add(p, i), pos)
        timed(f"scatter_add_sort_w{w}", lambda p, i=idx_sort: scat_add(p, i), pos)

        def scat_set(p, i):
            return p * 0.999999 + jnp.zeros_like(p).at[i].set(contrib)

        timed(f"scatter_set_perm_w{w}", lambda p, i=idx_perm: scat_set(p, i), pos)

    # Lane-space gather: rows as (ns//c, c) cells, take whole sublane rows.
    c = 128
    posl = jnp.asarray(rng.standard_normal((ns // c * c,)), jnp.float32)
    idx_l = jnp.asarray(rng.integers(0, ns // c * c, rows), jnp.int32)
    timed(
        "gather_flat_scalar",
        lambda p, i=idx_l: p + 1e-12 * jnp.sum(p.at[i].get()),
        posl,
    )


if __name__ == "__main__":
    main()
