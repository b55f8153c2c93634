"""End-to-end multi-device driver (ShardedSimulator / --ndev) tests.

The reference runs multi-GPU transparently through the same main loop
(`src/main.cc:385-477`); these tests require the sharded driver to
reproduce the single-device run (id-sorted state equality), to create
inlet particles across devices, and to produce writer output through the
CLI path.
"""
import os

import numpy as np
import pytest

from gpusph_tpu.integrator import Simulator
from gpusph_tpu.parallel.runner import ShardedSimulator
from gpusph_tpu.problems.base import get_problem


def by_id(st):
    act = np.asarray(st.active)
    ids = np.asarray(st.id)[act]
    order = np.argsort(ids)
    return (
        ids[order],
        np.asarray(st.pos)[act][order],
        np.asarray(st.rho)[act][order],
    )


def test_runner_matches_single_device():
    """DamBreak3D (moving-body feedback obstacle) through the full driver:
    3 chunks sharded over 4 devices == single device, id-sorted."""
    P1 = get_problem("DamBreak3D")(dict(deltap=0.06))
    grid, s1 = P1.build()
    fw = P1.fw.finalize()
    sim1 = Simulator(fw, grid, bodies_specs=P1.body_specs(), use_pallas=False)
    out1 = sim1.run(s1, maxiter=25, tend=0.0)

    P4 = get_problem("DamBreak3D")(dict(deltap=0.06))
    grid4, s4 = P4.build()
    fw4 = P4.fw.finalize()
    sim4 = ShardedSimulator(fw4, grid4, ndev=4,
                            bodies_specs=P4.body_specs(), use_pallas=False)
    out4 = sim4.run(s4, maxiter=25, tend=0.0)

    assert sim4.iterations == sim1.iterations
    assert sim4.dt == pytest.approx(sim1.dt, rel=1e-5)
    ids1, pos1, rho1 = by_id(out1)
    ids4, pos4, rho4 = by_id(out4)
    np.testing.assert_array_equal(ids1, ids4)
    np.testing.assert_allclose(pos4, pos1, atol=1e-5)
    np.testing.assert_allclose(rho4, rho1, atol=1e-3)


def test_runner_channel_io_inlet_creation():
    """ChannelIO sharded over 4 devices: open-boundary particle creation
    and destruction work through the driver (gather -> host create ->
    re-scatter at chunk cadence), tracking the single-device run."""
    def make():
        # short ramp + fast inflow so vertex masses fill within the first
        # chunks (creation must actually trigger for this test to bite)
        P = get_problem("ChannelIO")(
            dict(deltap=0.05, tend=0.3, velocity=0.5, ramp=0.02))
        grid, state = P.build()
        return P, grid, state

    P1, grid1, s1 = make()
    id_max1 = int(np.asarray(s1.id).max())
    sim1 = Simulator(P1.fw, grid1, use_pallas=False)
    out1 = sim1.run(s1, maxiter=25, tend=0.0)
    n1 = int(np.asarray(out1.active).sum())
    assert sim1._next_id > id_max1 + 1, (
        "single-device inlet never created a particle; test is vacuous"
    )

    P4, grid4, s4 = make()
    id_max4 = int(np.asarray(s4.id).max())
    sim4 = ShardedSimulator(P4.fw, grid4, ndev=4, use_pallas=False)
    out4 = sim4.run(s4, maxiter=25, tend=0.0)
    n4 = int(np.asarray(out4.active).sum())

    assert sim4._next_id > id_max4 + 1, (
        "sharded inlet never created a particle"
    )
    # creation order (slot/id assignment) is layout-dependent; the physical
    # particle budget must match closely
    assert abs(n4 - n1) <= max(2, int(0.02 * n1)), (n4, n1)


def test_cli_ndev_writes_output(tmp_path):
    """`python -m gpusph_tpu DamBreak3D --ndev 4` end-to-end: the CLI
    builds the sharded driver and the writers produce output."""
    from gpusph_tpu.cli import main

    out = tmp_path / "mgpu"
    rc = main([
        "DamBreak3D", "--deltap", "0.06", "--maxiter", "10",
        "--ndev", "4", "--dir", str(out),
    ])
    assert rc == 0
    files = os.listdir(out)
    assert any(f.endswith(".pvd") for f in files), files
    assert any(f.endswith(".vtu") for f in files), files
