"""The (env-gated, measured-slower) Pallas compaction kernel must stay
bitwise-identical to the XLA log-shift rounds it mirrors."""

import jax.numpy as jnp
import numpy as np

from emdee_tpu.neighbors.pallas_compact import compact_window_pallas


def _xla_rounds(s, cand, k, c):
    s = jnp.asarray(s)
    cand = [jnp.asarray(f) for f in cand]
    n_bits = int(np.ceil(np.log2(k)))
    ci = jnp.arange(k)
    for j in range(n_bits):
        sh = 1 << j
        moving = (s & sh) != 0
        arrive = jnp.roll(moving, -sh, axis=1) & (ci[None, :] < k - sh)
        cand = [jnp.where(arrive, jnp.roll(f, -sh, axis=1), f) for f in cand]
        s = jnp.where(arrive, jnp.roll(s, -sh, axis=1) - sh, s)
        s = jnp.where(moving & ~arrive, 0, s)
    return [np.asarray(f[:, :c]) for f in cand]


def test_compact_kernel_matches_xla_rounds_bitwise():
    rng = np.random.default_rng(0)
    c = 32
    k = 3 * c
    rows = 200
    mask = rng.random((rows, k)) < 0.3
    rank = np.cumsum(mask, axis=1) - mask
    iota = np.arange(k)[None, :]
    s = np.where(mask, iota - rank, 0).astype(np.int32)
    f1 = rng.standard_normal((rows, k)).astype(np.float32)
    f2 = rng.integers(0, 1000, (rows, k)).astype(np.int32)

    ref = _xla_rounds(s, [f1, f2], k, c)
    out = compact_window_pallas(
        jnp.asarray(s), [jnp.asarray(f1), jnp.asarray(f2)], c, interpret=True
    )
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(r, np.asarray(o))
    assert np.asarray(out[1]).dtype == np.int32
