"""I/O subsystem tests: VTU round trip, hotfile checkpoint/resume parity."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from gpusph_tpu.bodies import init_bodies_state
from gpusph_tpu.integrator import make_sim_chunk
from gpusph_tpu.io.hotfile import HotWriter, load_hotfile, save_hotfile
from gpusph_tpu.io.vtk import VTKWriter, read_vtu
from gpusph_tpu.io.writers import WriterDispatcher, state_arrays
from gpusph_tpu.problems.base import get_problem


@pytest.fixture
def small_sim():
    P = get_problem("StillWater")(dict(ppH=8))
    grid, state = P.build()
    return P, grid, state


def test_vtu_roundtrip(tmp_path, rng):
    w = VTKWriter(str(tmp_path))
    n = 100
    pos = rng.uniform(size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    rho = rng.uniform(size=n).astype(np.float32)
    path = w.write(0.5, {"pos": pos, "Velocity": vel, "Density": rho})
    back = read_vtu(path)
    np.testing.assert_allclose(back["pos"], pos)
    np.testing.assert_allclose(back["Velocity"], vel)
    np.testing.assert_allclose(back["Density"], rho)
    assert os.path.exists(os.path.join(tmp_path, "PART.pvd"))


def test_hotfile_roundtrip(tmp_path, small_sim):
    P, grid, state = small_sim
    path = str(tmp_path / "hot.npz")
    save_hotfile(path, state, t=1.25, dt=1e-4, iterations=42)
    st2, header, _ = load_hotfile(path)
    assert header["t"] == 1.25
    assert header["iterations"] == 42
    np.testing.assert_array_equal(np.asarray(st2.pos), np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(st2.info), np.asarray(state.info))


def test_hotwriter_rotation(tmp_path, small_sim):
    P, grid, state = small_sim
    hw = HotWriter(str(tmp_path), keep=2)
    for i in range(4):
        hw.write(state, t=float(i), dt=1e-4, iterations=i)
    import glob

    files = glob.glob(str(tmp_path / "hot_*.npz"))
    assert len(files) == 2
    _, header, _ = load_hotfile(hw.latest())
    assert header["t"] == 3.0


def test_resume_continues_identically(tmp_path, small_sim):
    """check-resume.sh analogue: run 2 chunks, checkpoint, run 2 more; the
    resumed run must match the uninterrupted one exactly."""
    P, grid, state = small_sim
    fw = P.fw.finalize()
    chunk = make_sim_chunk(fw, grid, use_pallas=False)
    bodies = init_bodies_state((), state)

    dt = jnp.float32(1e-4)
    t = jnp.float32(0.0)
    it = jnp.int32(0)

    s = state
    for _ in range(2):
        s, dt, t, it, bodies, _ = chunk(s, dt, t, it, bodies)
    # checkpoint mid-run
    path = str(tmp_path / "ck.npz")
    save_hotfile(path, s, t=float(t), dt=float(dt), iterations=int(it))

    # continue original
    s_cont, dt_c, t_c = s, dt, t
    it_c, b_c = it, bodies
    for _ in range(2):
        s_cont, dt_c, t_c, it_c, b_c, _ = chunk(s_cont, dt_c, t_c, it_c, b_c)

    # resume from checkpoint
    s_res, header, _ = load_hotfile(path)
    dt_r = jnp.float32(header["dt"])
    t_r = jnp.float32(header["t"])
    it_r = jnp.int32(header["iterations"])
    b_r = init_bodies_state((), s_res)
    for _ in range(2):
        s_res, dt_r, t_r, it_r, b_r, _ = chunk(s_res, dt_r, t_r, it_r, b_r)

    np.testing.assert_array_equal(np.asarray(s_res.pos), np.asarray(s_cont.pos))
    np.testing.assert_array_equal(np.asarray(s_res.rho), np.asarray(s_cont.rho))
    assert float(dt_r) == float(dt_c)


def test_writer_dispatcher(tmp_path, small_sim):
    P, grid, state = small_sim
    fw = P.fw.finalize()
    w = WriterDispatcher(
        str(tmp_path), fw, vtk_every=0.1, hot_every=0.2, gages=[(0.25, 0.25)]
    )
    w.maybe_write(0.0, state)
    w.maybe_write(0.15, state)
    w.maybe_write(0.25, state, dt=1e-4, iterations=10)
    import glob

    assert len(glob.glob(str(tmp_path / "data" / "*.vtu"))) >= 2
    assert os.path.getsize(tmp_path / "energy.txt") > 0
    assert os.path.getsize(tmp_path / "WaveGage.txt") > 0
    assert len(glob.glob(str(tmp_path / "hot_*.npz"))) >= 1
