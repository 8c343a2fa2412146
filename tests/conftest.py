"""Test configuration: run on CPU with 8 virtual devices.

The reference's answer to "device code without a device" was to skip
(runtests.jl:55 gates on CUDA.functional()).  Ours is the TPU-world pattern:
emulate an 8-device mesh on CPU via XLA_FLAGS so every kernel, sharding, and
collective is exercised in CI without TPU hardware (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# If a TPU-tunnel PJRT plugin (e.g. "axon") was registered by a site hook, its
# mere presence in the backend-factory table makes the *first* host transfer in
# the process take minutes (tunnel handshake/timeouts) even under
# JAX_PLATFORMS=cpu.  Tests are CPU-only — drop every non-CPU factory before
# backends initialize.
try:
    import jax
    import jax._src.xla_bridge as _xb

    # Keep the stock 'tpu' factory: deleting it breaks pallas imports
    # (platform-lowering registration); only third-party tunnels slow us.
    for _name in [k for k in _xb._backend_factories if k not in ("cpu", "tpu")]:
        del _xb._backend_factories[_name]
    # jax may already be imported (site hooks), so the env var alone is too
    # late — update the latched config as well.
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np
import pytest

REFERENCE_DATA = "/root/reference/test/data"


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="run the full tier (expensive sharded/fidelity tests) too",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: the default run is the QUICK tier (CI-friendly, keeps
    `pytest tests/ -x -q` a habit as the suite grows); `--full` (or
    EMDEE_TEST_FULL=1) adds the expensive long-rollout/sharded gates —
    run that tier before benching or shipping engine changes."""
    if config.getoption("--full") or os.environ.get("EMDEE_TEST_FULL"):
        return
    skip = pytest.mark.skip(
        reason="full-tier test — pass --full (or EMDEE_TEST_FULL=1)"
    )
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip)


def reference_data_path(name: str):
    path = os.path.join(REFERENCE_DATA, name)
    return path if os.path.exists(path) else None


@pytest.fixture(scope="session")
def lj_sample():
    """The reference's 800-atom LJ differential-test fixture
    (runtests.jl:58: L=10, rc=3, rs=2.5, uniform ε=σ=1), read from the
    read-only reference mount when present, otherwise regenerated with the
    same statistics (uniform random positions in a 10³ box)."""
    path = reference_data_path("lj_sample.xyz")
    if path is not None:
        from emdee_tpu.io.xyz import read_xyz

        _, pos, _ = read_xyz(path)
    else:
        rng = np.random.default_rng(20260816)
        pos = rng.uniform(0.0, 10.0, (800, 3))
    return pos, 10.0, 3.0, 2.5
