"""Velocity I/O: XYZ velocity columns → System → make_state.

The reference pulls velocities from its I/O frame (modelling.jl:240); these
tests cover the equivalent path (PDB has no velocity records, so only XYZ
carries them) plus checkpoint suffix/validation behavior."""

import io

import numpy as np
import pytest

from emdee_tpu.io.xyz import XYZFrame, _read_xyz_stream, read_xyz_frame, write_xyz


def _sample(n=5, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 10, (n, 3)).round(6), rng.normal(0, 1, (n, 3)).round(6)


def test_xyz_velocity_roundtrip_python():
    pos, vel = _sample()
    buf = io.StringIO()
    write_xyz(buf, "Ar", pos, comment="with velocities", velocities=vel)
    buf.seek(0)
    frame = _read_xyz_stream(buf)
    assert frame.velocities is not None
    np.testing.assert_allclose(frame.positions, pos)
    np.testing.assert_allclose(frame.velocities, vel)


def test_xyz_without_velocities_gives_none():
    pos, _ = _sample()
    buf = io.StringIO()
    write_xyz(buf, "Ar", pos)
    buf.seek(0)
    frame = _read_xyz_stream(buf)
    assert frame.velocities is None


def test_native_xyz_velocities_match_python(tmp_path):
    from emdee_tpu.native import chemio

    if not chemio.available():
        pytest.skip("native library unavailable")
    pos, vel = _sample(n=8, seed=3)
    path = tmp_path / "v.xyz"
    write_xyz(str(path), "Ar", pos, velocities=vel)
    names_c, pos_c, vel_c, _ = chemio.read_xyz(str(path))
    frame_py = read_xyz_frame(io.StringIO(path.read_text()))
    assert vel_c is not None and frame_py.velocities is not None
    np.testing.assert_allclose(pos_c, frame_py.positions)
    np.testing.assert_allclose(vel_c, frame_py.velocities)


def test_system_threads_xyz_velocities(tmp_path):
    from emdee_tpu.modelling.system import System

    pos, vel = _sample(n=4, seed=1)
    path = tmp_path / "sys.xyz"
    write_xyz(str(path), ["C", "C", "O", "H"], pos, velocities=vel)
    system = System.from_file(str(path))
    np.testing.assert_allclose(system.velocities, vel)
    # make_state carries them onto the device state
    system.box_lengths = np.array([20.0, 20.0, 20.0])
    state = system.make_state()
    np.testing.assert_allclose(np.asarray(state.velocities), vel, rtol=1e-6)


def test_checkpoint_suffix_and_validation(tmp_path):
    from emdee_tpu.utils.checkpoint import load_state, save_state

    state = {"a": np.arange(6, dtype=np.float32), "b": np.ones((2, 3))}
    base = str(tmp_path / "ckpt")  # extension-less: np.savez appends .npz
    save_state(base, state, step=7)
    loaded, meta = load_state(base, state)
    assert meta["step"] == 7
    np.testing.assert_array_equal(loaded["a"], state["a"])

    with pytest.raises(ValueError, match="shape/dtype"):
        load_state(base, {"a": np.arange(5, dtype=np.float32), "b": np.ones((2, 3))})
    with pytest.raises(ValueError, match="leaves"):
        load_state(base, {"a": np.arange(6, dtype=np.float32)})
