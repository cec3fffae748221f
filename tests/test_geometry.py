"""Ray/cell geometry and point-location tests."""

import jax.numpy as jnp
import numpy as np

from rac2d_tpu.models.density import AndrewsDisk
from rac2d_tpu.models.grid import GridConfig, make_grid
from rac2d_tpu.ops import geometry


def test_exit_plane():
    # straight up from inside a cell: exit through the top
    L, eps, d, found = geometry.ray_cell_exit(
        jnp.array(2.0), jnp.array(0.0), jnp.array(0.5),
        jnp.array(0.0), jnp.array(0.0), jnp.array(1.0),
        jnp.array(1.0), jnp.array(3.0), jnp.array(0.0), jnp.array(1.0))
    assert bool(found)
    assert abs(float(L) - 0.5) < 1e-12
    assert int(d) == geometry.DIR_TOP


def test_exit_cylinder():
    # radially outward: exit through the outer cylinder
    L, eps, d, found = geometry.ray_cell_exit(
        jnp.array(2.0), jnp.array(0.0), jnp.array(0.5),
        jnp.array(1.0), jnp.array(0.0), jnp.array(0.0),
        jnp.array(1.0), jnp.array(3.0), jnp.array(0.0), jnp.array(1.0))
    assert bool(found)
    assert abs(float(L) - 1.0) < 1e-12
    assert int(d) in (5, 6)


def test_exit_mirror():
    # downward through the midplane of a mirrored cell: path reflects
    L, eps, d, found = geometry.ray_cell_exit_mirror(
        jnp.array(2.0), jnp.array(0.0), jnp.array(-0.5),
        jnp.array(0.0), jnp.array(0.0), jnp.array(-1.0),
        jnp.array(1.0), jnp.array(3.0), jnp.array(0.0), jnp.array(1.0))
    assert bool(found)
    assert abs(float(L) - 0.5) < 1e-12


def test_locate_roundtrip():
    a = AndrewsDisk(Md=0.01, rin=1.0, rout=50.0, rc=20.0, hc=5.0)
    g = make_grid(GridConfig(rmin=1.0, rmax=50.0, zmax=50.0, ncol=16), a)
    gi = geometry.build_grid_index(g)
    rng = np.random.default_rng(0)
    # every cell center must locate to itself
    rc, zc = g.centers()
    cells = np.asarray(geometry.locate(
        gi, jnp.asarray(rc ** 2), jnp.asarray(zc)))
    assert (cells == np.arange(g.n_cells)).all()
    # points outside the domain -> -1
    out = geometry.locate(gi, jnp.asarray(0.25), jnp.asarray(0.0))
    assert int(out) == -1
