"""Rebin cost decomposition on real TPU (v2).

Times the pieces of `_rebin` at benchmark scale (157k slots, C=32) inside a
lax.scan whose carry IS each op's own output — zero-cost input evolution, so
the loop body is the op alone (axon dedups identical dispatches; chaining
defeats that).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NS = 4913 * 32
ITERS = 60


def report(name, dt):
    print(json.dumps({"variant": name, "ms": round(1e3 * dt, 3)}), flush=True)


def timed(run, *args):
    import jax

    out = run(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    out = run(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = run(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / ITERS


def main(which):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 4914, NS).astype(np.int32))

    if "argsort" in which:
        @jax.jit
        def run(k):
            def step(k, _):
                # the permutation is itself a fresh i32 key array
                return jnp.argsort(k, stable=True).astype(jnp.int32), None
            k, _ = jax.lax.scan(step, k, None, length=ITERS)
            return k
        report("argsort", timed(run, keys))

    for nf in (7, 13):
        tag = f"gather{nf}"
        if tag in which:
            p0 = jnp.asarray(rng.normal(size=(NS, nf)).astype(np.float32))
            order = jnp.argsort(keys, stable=True).astype(jnp.int32)

            @jax.jit
            def run(p, order):
                def step(p, _):
                    return p[order], None
                p, _ = jax.lax.scan(step, p, None, length=ITERS)
                return p
            report(tag, timed(run, p0, order))

    if "gatherflat" in which:
        # single flat (NS,) gather — the per-element vs per-row question
        p0 = jnp.asarray(rng.normal(size=NS).astype(np.float32))
        order = jnp.argsort(keys, stable=True).astype(jnp.int32)

        @jax.jit
        def run(p, order):
            def step(p, _):
                return p[order], None
            p, _ = jax.lax.scan(step, p, None, length=ITERS)
            return p
        report("gatherflat", timed(run, p0, order))

    if "gather128" in which:
        p0 = jnp.asarray(rng.normal(size=(NS // 8, 128)).astype(np.float32))
        order8 = jnp.asarray(rng.permutation(NS // 8).astype(np.int32))

        @jax.jit
        def run(p, order):
            def step(p, _):
                return p[order], None
            p, _ = jax.lax.scan(step, p, None, length=ITERS)
            return p
        report("gather128", timed(run, p0, order8))

    if "sortpay7" in which:
        p0 = [jnp.asarray(rng.normal(size=NS).astype(np.float32)) for _ in range(7)]

        @jax.jit
        def run(k, ps):
            def step(carry, _):
                k, ps = carry
                out = jax.lax.sort([k] + ps, num_keys=1, is_stable=True)
                # recycle: sorted key xor'd back into pseudo-random keys
                k2 = (out[0] * 2654435761 + 12345) % 4914
                return (k2.astype(jnp.int32), list(out[1:])), None
            (k, ps), _ = jax.lax.scan(step, (k, ps), None, length=ITERS)
            return k, ps
        report("sortpay7", timed(run, keys, p0))

    if "searchsorted" in which:
        sk = jnp.sort(keys)

        @jax.jit
        def run(sk):
            def step(sk, _):
                s = jnp.searchsorted(sk, jnp.arange(4914, dtype=jnp.int32))
                # keep sk evolving cheaply: add 0 of s's first element
                return sk + (s[0] * 0).astype(jnp.int32), None
            sk, _ = jax.lax.scan(step, sk, None, length=ITERS)
            return sk
        report("searchsorted", timed(run, sk))


if __name__ == "__main__":
    main(
        sys.argv[1:]
        or ["argsort", "gather7", "gather13", "gatherflat", "gather128", "sortpay7", "searchsorted"]
    )
