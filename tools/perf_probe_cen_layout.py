"""Probe: can Mosaic lower the lhs-transposed center-expansion matmul, and
at what cost vs the current (nC, M) @ (M, M·C) orientation?

The resident kernel's per-step XLA glue (device trace, tools/perf_profile.py)
is dominated by layout-flip copies feeding the `center()` transpose in
`_prep_inputs`.  Storing centers as (M², M, n·C) removes the transpose on
the XLA side, IF the in-kernel expansion can contract over dim 0 of both
operands without Mosaic inserting a real transpose (the output-side
equivalent was measured NET NEGATIVE, pallas_cell_kernel.py:1077-1080).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_probe_cen_layout.py
"""

import time
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, C, NC = 17, 32, 96
MC = M * C
PROGS = M * M
REPS = 200


def kern_std(cen_ref, exp_ref, out_ref):
    out_ref[:] = jnp.dot(
        cen_ref[:], exp_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def kern_dgt(cen_ref, exp_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        cen_ref[:], exp_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def run(name, kern, cen_shape):
    cen = jnp.asarray(np.random.rand(PROGS, *cen_shape), jnp.float32)
    exp = jnp.asarray(np.random.rand(M, MC), jnp.float32)

    f = pl.pallas_call(
        kern,
        grid=(PROGS,),
        in_specs=[
            pl.BlockSpec((1, *cen_shape), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, MC), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NC, MC), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PROGS, NC, MC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )

    def squeeze(kfn):
        def wrapped(c_ref, e_ref, o_ref):
            pass
        return wrapped

    try:
        out = jax.block_until_ready(jax.jit(f)(cen, exp))
    except Exception as e:  # compile failure is the answer we came for
        print(json.dumps({"variant": name, "error": str(e)[:300]}))
        return None
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(cen, exp)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 4)}))
    return np.asarray(out)


def main():
    np.random.seed(0)
    # Reference data: same logical contents both ways.
    a = run("std_(nC,M)", lambda c, e, o: kern_std(
        c.at[0], e, o.at[0]) if False else _std3(c, e, o), (NC, M))
    b = run("dgt_(M,nC)", _dgt3, (M, NC))
    if a is not None and b is not None:
        print(json.dumps({"note": "values not compared (random inputs differ)"}))


def _std3(c_ref, e_ref, o_ref):
    o_ref[0] = jnp.dot(
        c_ref[0], e_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dgt3(c_ref, e_ref, o_ref):
    o_ref[0] = jax.lax.dot_general(
        c_ref[0], e_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


if __name__ == "__main__":
    main()
