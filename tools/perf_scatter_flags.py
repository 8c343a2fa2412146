"""Scatter/gather flag microbench: does unique_indices / indices_are_sorted
change the TPU row rate at the molecular bonded-path shapes?

The production molecular step's two hottest non-kernel ops are the bonded
scatter-set (96k rows -> (110593, 3), 0.62 ms traced) and scatter-add
(~13k rows, 0.44 ms traced); both are emitted without XLA's uniqueness /
sortedness hints (cell_dense_molecular.py:666,680).  Measures every flag
combination at those shapes plus the pocket-sum alternative's constituent
rates (gather + segment ladder + small set).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_scatter_flags.py
"""

from __future__ import annotations

import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emdee_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def bench(fn, *args, iters=200):
    import jax

    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    ns = 110592
    rng = np.random.default_rng(0)

    # --- scatter-SET, unique real targets + duplicate pad tail (prod shape)
    r_set = 96000
    pad_tail = 2000
    tgt = rng.permutation(ns)[:r_set]
    idx_np = np.concatenate([tgt, np.full(pad_tail, ns)])
    contrib_np = rng.normal(size=(len(idx_np), 3)).astype(np.float32)
    contrib_np[r_set:] = 0.0
    idx = jnp.asarray(idx_np, jnp.int32)
    idx_sorted = jnp.asarray(np.sort(idx_np), jnp.int32)
    contrib = jnp.asarray(contrib_np)

    def mk_set(unique, srt, ix):
        def f(c):
            z = jnp.zeros((ns + 1, 3), jnp.float32)
            return z.at[ix].set(c, unique_indices=unique, indices_are_sorted=srt)
        return f

    for name, unique, srt, ix in [
        ("set  flags=none      ", False, False, idx),
        ("set  unique          ", True, False, idx),
        ("set  sorted          ", False, True, idx_sorted),
        ("set  unique+sorted   ", True, True, idx_sorted),
    ]:
        ms = bench(mk_set(unique, srt, ix), contrib)
        print(f"{name} rows={len(idx_np)}  {ms:.3f} ms  {ms*1e6/len(idx_np):.2f} ns/row")

    # --- scatter-ADD at the shared-row shape
    r_add = 13000
    tgt_a = rng.integers(0, ns, r_add)
    idx_a = jnp.asarray(tgt_a, jnp.int32)
    idx_a_sorted = jnp.asarray(np.sort(tgt_a), jnp.int32)
    contrib_a = jnp.asarray(rng.normal(size=(r_add, 3)).astype(np.float32))

    def mk_add(srt, ix):
        def f(base, c):
            return base.at[ix].add(c, indices_are_sorted=srt)
        return f

    base = jnp.zeros((ns + 1, 3), jnp.float32)
    for name, srt, ix in [
        ("add  flags=none      ", False, idx_a),
        ("add  sorted          ", True, idx_a_sorted),
    ]:
        ms = bench(mk_add(srt, ix), base, contrib_a)
        print(f"{name} rows={r_add}  {ms:.3f} ms  {ms*1e6/r_add:.2f} ns/row")

    # --- pocket-sum alternative constituents
    # gather 13k rows, ladder-sum (log2 mult), set ~6k rows
    perm = jnp.asarray(rng.permutation(r_add), jnp.int32)
    ms = bench(lambda c: c[perm], contrib_a)
    print(f"gather 13k rows                {ms:.3f} ms  {ms*1e6/r_add:.2f} ns/row")
    k = 6000
    tgt_k = rng.permutation(ns)[:k]
    idx_k = jnp.asarray(tgt_k, jnp.int32)
    contrib_k = jnp.asarray(rng.normal(size=(k, 3)).astype(np.float32))
    ms = bench(mk_set(True, False, idx_k), contrib_k)
    print(f"set 6k rows unique             {ms:.3f} ms  {ms*1e6/k:.2f} ns/row")

    # --- combined big set: 109k rows one call vs two calls
    idx_all = jnp.asarray(np.concatenate([idx_np, tgt_k]), jnp.int32)
    contrib_all = jnp.concatenate([contrib, contrib_k])
    ms = bench(mk_set(True, False, idx_all), contrib_all)
    print(f"set 104k+pad rows unique merged {ms:.3f} ms  {ms*1e6/len(idx_all):.2f} ns/row")


if __name__ == "__main__":
    main()
