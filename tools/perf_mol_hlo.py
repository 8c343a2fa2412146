"""Map the molecular step's hot trace fusions (perf_profile_mol.py) to HLO.

Compiles the production 97k molecular rollout (cache-hit on TPU) and prints
the definition of the named fusions, so the 0.6/0.4 ms trace entries can be
attributed to gather vs scatter vs force-math before deciding what a bonded
Pallas kernel must replace.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_mol_hlo.py fusion.1009 fusion.1025 ...
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emdee_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(names):
    import jax

    from emdee_tpu.modelling.forcefield import ForceField
    from emdee_tpu.modelling.system import System
    from emdee_tpu.neighbors.cell_dense_molecular import dense_sim_from_system
    from perf_mol import tile_system

    ff = ForceField("/root/reference/test/data/dibenzo-p-dioxin-in-water.xml")
    base = System("/root/reference/test/data/dibenzo-p-dioxin-in-water.pdb", ff)
    system = tile_system(base, 4)
    n = len(system)
    rng = np.random.default_rng(5)
    vel = rng.normal(scale=0.05, size=(n, 3))
    state, rollout, energy, config = dense_sim_from_system(
        system, cutoff=7.0, switch=6.0, dt=5e-4, skin=1.0,
        velocities=vel, spill=True,
    )
    fn = jax.jit(lambda s: rollout(s, num_steps=60, rebin_every=6))
    txt = fn.lower(state).compile().as_text()
    lines = txt.splitlines()
    for name in names:
        pat = re.compile(rf"%?{re.escape(name)}\b")
        hits = [i for i, l in enumerate(lines) if pat.search(l) and "= " in l and "fusion" in l.split("= ")[-1][:60]]
        print(f"===== {name}: {len(hits)} definition-ish lines")
        for i in hits[:2]:
            print(lines[i][:600])
        # Find the fused computation body
        m = re.search(rf"{re.escape(name)} = [^\n]*calls=([%\w.\-]+)", txt)
        if m:
            comp = m.group(1).lstrip("%")
            start = None
            for i, l in enumerate(lines):
                if l.startswith(f"%{comp} ") or l.startswith(f"{comp} "):
                    start = i
                    break
            if start is not None:
                depth = 0
                ops = []
                for l in lines[start:start + 400]:
                    depth += l.count("{") - l.count("}")
                    s = l.strip()
                    mm = re.match(r"%?[\w.\-]+ = \S+ (\w+)\(", s)
                    if mm:
                        ops.append(mm.group(1))
                    if depth <= 0 and len(ops) > 0 and "}" in l:
                        break
                from collections import Counter
                print(f"  body ops: {Counter(ops).most_common(12)}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["fusion.1009", "fusion.1025", "fusion.983", "fusion.982"])
