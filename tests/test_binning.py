"""Closed-form bin-index machinery vs searchsorted ground truth.

The MC walk replaces every per-step binary search with closed-form
index arithmetic (segmented master lambda grid: optics.lam_to_bin;
log-uniform Tdust LUT: optics.tdust_bin; radial column LUT:
geometry.locate fast path).  These must agree with searchsorted on the
actual grids.
"""
import numpy as np
import jax.numpy as jnp

from rac2d_tpu.ops import geometry, optics


class _GrayMix:
    lam = np.logspace(1, 8, 241)
    kab = np.ones(241)
    ksc = np.ones(241) * 0.3
    g = np.zeros(241)
    pmass = 1e-14


def test_lam_to_bin_matches_searchsorted():
    cfg = optics.McConfig(nlen_lut=64)
    lam, seg = optics.master_lam_grid([_GrayMix()], cfg)
    assert np.all(np.diff(lam) > 0)
    rng = np.random.default_rng(0)
    t = 10 ** rng.uniform(np.log10(lam[0]) + 1e-9,
                          np.log10(lam[-1]) - 1e-9, 100_000)
    ref = np.clip(np.searchsorted(lam, t) - 1, 0, len(lam) - 1)
    got = optics.lam_to_bin(seg, t, xp=np)
    np.testing.assert_array_equal(got, ref)
    # the Lyman-alpha window specifically (fine +-logspace channels)
    t2 = seg.lam0 * (1 + rng.uniform(-0.089, 0.089, 100_000))
    ref2 = np.clip(np.searchsorted(lam, t2) - 1, 0, len(lam) - 1)
    got2 = optics.lam_to_bin(seg, t2, xp=np)
    np.testing.assert_array_equal(got2, ref2)
    # f32 (the walk's working precision): within one bin everywhere
    got3 = np.asarray(optics.lam_to_bin(seg, jnp.asarray(t, jnp.float32)))
    assert (np.abs(got3 - ref) <= 1).all()


def test_tdust_bin_matches_searchsorted():
    Tds = np.logspace(0.0, np.log10(2000.0), 256)
    rng = np.random.default_rng(1)
    T = 10 ** rng.uniform(-0.5, 3.6, 50_000)
    ref = np.clip(np.searchsorted(Tds, T), 0, 255)
    got = optics.tdust_bin(Tds, T, xp=np)
    np.testing.assert_array_equal(got, ref)


def test_locate_r_lut_matches_searchsorted():
    """build_grid_index's radial LUT fast path must agree with the
    searchsorted fall-back on random points, including near column
    boundaries."""

    class G:
        pass

    rng = np.random.default_rng(2)
    ncol = 60
    r_edges = np.sort(10 ** rng.uniform(0, 2, ncol + 1))
    nz = 3
    g = G()
    g.n_columns = ncol
    g.col_ptr = np.arange(ncol + 1) * nz
    g.col_cells = np.arange(ncol * nz)
    g.zmin = np.tile(np.array([0.0, 1.0, 2.0]), ncol)
    g.zmax = np.tile(np.array([1.0, 2.0, 3.0]), ncol)
    # per-cell radial bounds: column i spans r_edges[i]..r_edges[i+1]
    g.rmin = np.repeat(r_edges[:-1], nz)
    g.rmax = np.repeat(r_edges[1:], nz)
    gi = geometry.build_grid_index(g)
    assert gi.r_lut is not None

    gi_slow = gi._replace(r_lut=None)
    r = 10 ** rng.uniform(0.001, 1.999, 50_000)
    # add points hugging boundaries
    r = np.concatenate([r, r_edges[1:-1] * (1 + 1e-9),
                        r_edges[1:-1] * (1 - 1e-9)])
    z = rng.uniform(0.0, 2.99, len(r))
    fast = np.asarray(geometry.locate(gi, jnp.asarray(r * r),
                                      jnp.asarray(z)))
    slow = np.asarray(geometry.locate(gi_slow, jnp.asarray(r * r),
                                      jnp.asarray(z)))
    np.testing.assert_array_equal(fast, slow)
