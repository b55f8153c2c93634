"""Tests for the cell-grid neighbor infrastructure vs brute force."""
import numpy as np
import jax.numpy as jnp

from gpusph_tpu.defs import Periodicity, ParticleType
from gpusph_tpu.ops.neighbors import build_cells, cell_hash, make_grid
from gpusph_tpu.ops.pair import neighbor_apply
from gpusph_tpu.state import empty_state, make_info


def random_state(rng, n, box=1.0, capacity=None):
    capacity = capacity or n
    st = empty_state(capacity)
    pos = rng.uniform(0, box, size=(n, 3)).astype(np.float32)
    info = np.full(capacity, int(ParticleType.NONE), np.uint32)
    info[:n] = np.uint32(int(ParticleType.FLUID))
    return st.replace(
        pos=st.pos.at[:n].set(jnp.asarray(pos)),
        mass=st.mass.at[:n].set(1.0),
        info=jnp.asarray(info),
    )


def test_cells_partition_particles(rng):
    grid = make_grid((0, 0, 0), (1, 1, 1), 0.11)
    st = random_state(rng, 500, capacity=600)
    sorted_st, aux = build_cells(grid, st)
    n_cells = grid.n_cells
    starts = np.asarray(aux.cell_start)
    counts = np.asarray(aux.cell_count)
    # counts over real cells sum to active particles
    assert counts[:n_cells].sum() == 500
    assert int(aux.n_active) == 500
    # each cell slice actually contains particles hashed to that cell
    h = np.asarray(cell_hash(grid, sorted_st.pos, sorted_st.active))
    for c in range(n_cells):
        seg = h[starts[c] : starts[c + 1]]
        assert (seg == c).all()


def test_dead_particles_go_to_trash(rng):
    grid = make_grid((0, 0, 0), (1, 1, 1), 0.2)
    st = random_state(rng, 100, capacity=160)
    sorted_st, aux = build_cells(grid, st)
    counts = np.asarray(aux.cell_count)
    assert counts[grid.n_cells] == 60  # trash cell holds the dead slots


def brute_neighbor_count(pos, rad):
    n = pos.shape[0]
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    return ((d < rad) & ~np.eye(n, dtype=bool)).sum(1)


def test_pair_counts_match_brute_force(rng):
    rad = 0.13
    grid = make_grid((0, 0, 0), (1, 1, 1), rad)
    n = 400
    st = random_state(rng, n, capacity=512)
    sorted_st, aux = build_cells(grid, st)

    fields = {
        "pos_x": sorted_st.pos[:, 0],
        "pos_y": sorted_st.pos[:, 1],
        "pos_z": sorted_st.pos[:, 2],
    }

    def count_fn(c, nb, g):
        return {"count": jnp.where(g.mask, 1.0, 0.0)}

    out = neighbor_apply(
        grid, aux, fields, count_fn,
        max_parts_per_cell=32, influenceradius=rad, chunk_cells=16,
    )
    counts = np.asarray(out["count"])[np.asarray(sorted_st.active)]
    pos = np.asarray(sorted_st.pos)[np.asarray(sorted_st.active)]
    expected = brute_neighbor_count(pos.astype(np.float64), rad)
    # order matches since we evaluate on the sorted state
    np.testing.assert_array_equal(counts.astype(int), expected)


def test_pair_counts_periodic(rng):
    rad = 0.13
    grid = make_grid((0, 0, 0), (1, 1, 1), rad, periodic=Periodicity.XYZ)
    n = 300
    st = random_state(rng, n, capacity=300)
    sorted_st, aux = build_cells(grid, st)

    fields = {
        "pos_x": sorted_st.pos[:, 0],
        "pos_y": sorted_st.pos[:, 1],
        "pos_z": sorted_st.pos[:, 2],
    }

    def count_fn(c, nb, g):
        return {"count": jnp.where(g.mask, 1.0, 0.0)}

    out = neighbor_apply(
        grid, aux, fields, count_fn,
        max_parts_per_cell=64, influenceradius=rad, chunk_cells=16,
    )
    pos = np.asarray(sorted_st.pos, np.float64)
    delta = pos[:, None, :] - pos[None, :, :]
    delta -= np.round(delta)  # box size 1, min image
    d = np.linalg.norm(delta, axis=-1)
    expected = ((d < rad) & ~np.eye(n, dtype=bool)).sum(1)
    np.testing.assert_array_equal(np.asarray(out["count"]).astype(int), expected)


def test_overflow_detected(rng):
    grid = make_grid((0, 0, 0), (1, 1, 1), 0.5)
    st = random_state(rng, 200, capacity=200)  # ~25/cell in 8 cells
    _, aux = build_cells(grid, st)
    assert int(aux.max_occupancy) > 10
