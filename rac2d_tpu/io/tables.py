"""Physics lookup tables: Neufeld cooling, Visser CO shielding, ion LUTs.

Jittable accessors over tables shipped in rac2d_tpu/data/*.npz (extracted
from published datasets by tools/extract_ref_tables.py).  The interpolation
semantics replicate the reference accessors:
  - linear / bilinear with *edge-segment extrapolation* (reference
    src/load_Neufeld_cooling_H2O.f90:203-455 index search pattern),
  - Neufeld L0/L_LTE stored as -log10(L) (tables hold positive numbers),
  - the reference's n_12 sign convention for H2O/CO (10^-v; the H2 table
    uses 10^+v — src/load_Neufeld_cooling_H2.f90 tail vs
    _H2O.f90:636) is preserved verbatim as semantics,
  - Visser 12CO shielding: bilinear in (logN_CO, logN_H2) of log f with
    index clamping (src/load_Visser_CO_selfshielding.f90:271-310).
"""

from __future__ import annotations

import pathlib
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

DATA_DIR = pathlib.Path(__file__).parent.parent / "data"


def _lin_extrap(x, xs, ys):
    """1D linear interpolation, extrapolating with the edge segments."""
    n = xs.shape[0]
    s = jnp.clip(jnp.searchsorted(xs, x, side="left"), 1, n - 1)
    t = (x - xs[s - 1]) / (xs[s] - xs[s - 1])
    return ys[s - 1] + t * (ys[s] - ys[s - 1])


def _bilin_extrap(x, y, xs, ys, Z):
    """Bilinear (with cross term) on Z[nx, ny]; extrapolates at edges
    along x (temperature — matching the reference's linear-in-log
    extrapolation) but CLAMPS y (the log10 N~ column-density axis) to
    the table range: below-table N is the optically thin limit, which
    IS the lowest-N column, and an unclamped y from a zero column
    density (log10 TINY ~ -300) extrapolates to 10^(+-hundreds) —
    finite by accident on CPU, NaN under TPU f64 emulation (round-4
    chem_prod zero-progress bug)."""
    nx, ny = Z.shape
    y = jnp.clip(y, ys[0], ys[-1])
    i = jnp.clip(jnp.searchsorted(xs, x, side="left"), 1, nx - 1)
    j = jnp.clip(jnp.searchsorted(ys, y, side="left"), 1, ny - 1)
    tx = (x - xs[i - 1]) / (xs[i] - xs[i - 1])
    ty = (y - ys[j - 1]) / (ys[j] - ys[j - 1])
    z11 = Z[i - 1, j - 1]
    z12 = Z[i - 1, j]
    z21 = Z[i, j - 1]
    z22 = Z[i, j]
    return (z11 * (1 - tx) * (1 - ty) + z21 * tx * (1 - ty)
            + z12 * (1 - tx) * ty + z22 * tx * ty)


def _load(name):
    with np.load(DATA_DIR / f"{name}.npz") as d:
        return {k: jnp.asarray(v) for k, v in d.items()}


# --------------------------------------------------------------------------
# Neufeld molecular cooling parameterization: the cooling rate per volume is
#   L = n_H2 * n_M / (1/L0 + n_H2/L_LTE + 1/L0 (n_H2/n12)^alpha (1 - n12 L0/L_LTE))
# with (L0, L_LTE, n12, alpha) interpolated in (T, log10 N~) from tables.
# --------------------------------------------------------------------------

class NeufeldParams(NamedTuple):
    L0: jnp.ndarray
    L_LTE: jnp.ndarray
    n_12: jnp.ndarray
    alpha: jnp.ndarray


class NeufeldH2:
    """H2 rotational cooling table (22 log10 T points)."""

    def __init__(self):
        d = _load("neufeld_h2")
        self.logT = d["log10_T_s"]
        self.L0 = d["log10_L0"]
        self.L_LTE = d["log10_L_LTE"]
        self.n12 = d["log10_n_12"]
        self.alpha = d["alpha_s"]

    def params_scaled(self, T):
        """(params WITHOUT the Boltzmann factor, boltz): the exp(-509/T)
        suppression of the lowest rotational level (E(J=2-0)/k = 509 K)
        applies to BOTH L0 and L_LTE — reference
        load_Neufeld_cooling_H2.f90:101,112 (exp(-log10_L*ln10 - 509/T));
        without it H2 cooling is overestimated by e^(509/T) and freezes
        cold gas to T -> 0 (round-4 coupled-T collapse bug).  It is
        returned SEPARATELY so the caller can factor it out of the
        1/L0-style division chain: at low T the suppressed L values
        underflow the TPU backend's f32-exponent f64 emulation and the
        chain turns into 0/0."""
        Tpos = jnp.maximum(T, 1e-30)
        lt = jnp.log10(Tpos)
        boltz = jnp.exp(-509.0 / Tpos)
        L0 = 10.0 ** (-_lin_extrap(lt, self.logT, self.L0))
        L_LTE = 10.0 ** (-_lin_extrap(lt, self.logT, self.L_LTE))
        n12 = 10.0 ** (_lin_extrap(lt, self.logT, self.n12))
        al = jnp.maximum(_lin_extrap(lt, self.logT, self.alpha), 0.0)
        return NeufeldParams(L0, L_LTE, n12, al), boltz

    def params(self, T):
        p, boltz = self.params_scaled(T)
        return p._replace(L0=p.L0 * boltz, L_LTE=p.L_LTE * boltz)


class _NeufeldHighLow:
    """Shared high/low-temperature two-branch structure (H2O ortho/para
    mixing handled by pre-mixing the log tables is NOT valid because the
    reference mixes after interpolating each; we keep both)."""


class NeufeldH2O:
    def __init__(self):
        self.d = _load("neufeld_h2o")
        self.ortho, self.para = 0.75, 0.25

    def params(self, T, log10N):
        d = self.d
        lnT = jnp.log(jnp.maximum(T, 1e-30))
        hi = T >= 100.0

        def mix1(lo_o, lo_p):
            vo = _lin_extrap(T, d["T_low_ortho"], d[lo_o])
            vp = _lin_extrap(T, d["T_low_para"], d[lo_p])
            return self.ortho * vo + self.para * vp

        def mix2(lo_o, lo_p):
            vo = _bilin_extrap(lnT, log10N, jnp.log(d["T_low_ortho"]),
                               d["log10N_low_ortho"], d[lo_o])
            vp = _bilin_extrap(lnT, log10N, jnp.log(d["T_low_para"]),
                               d["log10N_low_para"], d[lo_p])
            return self.ortho * vo + self.para * vp

        v_L0 = jnp.where(
            hi, _lin_extrap(lnT, jnp.log(d["T_high"]), d["log10_L0_high"]),
            mix1("log10_L0_low_ortho", "log10_L0_low_para"))
        v_LTE = jnp.where(
            hi, _bilin_extrap(lnT, log10N, jnp.log(d["T_high"]),
                              d["log10N_high"], d["log10_L_LTE_high"]),
            mix2("log10_L_LTE_low_ortho", "log10_L_LTE_low_para"))
        v_n12 = jnp.where(
            hi, _bilin_extrap(lnT, log10N, jnp.log(d["T_high"]),
                              d["log10N_high"], d["log10_n_12_high"]),
            mix2("log10_n_12_low_ortho", "log10_n_12_low_para"))
        v_al = jnp.where(
            hi, _bilin_extrap(lnT, log10N, jnp.log(d["T_high"]),
                              d["log10N_high"], d["alpha_high"]),
            mix2("alpha_low_ortho", "alpha_low_para"))
        # reference sign convention: L -> 10^-v, n12 -> 10^-v (sic)
        return NeufeldParams(10.0 ** (-v_L0), 10.0 ** (-v_LTE),
                             10.0 ** (-v_n12), v_al)

    def vib_params(self, T, log10N):
        d = self.d
        T = jnp.maximum(T, 1e-30)
        L0 = 1.03e-26 * T * jnp.exp(-47.5 * T ** (-1.0 / 3.0) - 2325.0 / T)
        v = _bilin_extrap(jnp.log(T), log10N, jnp.log(d["T_high_vib"]),
                          d["log10N_high_vib"], d["log10_X_L_LTE_high_vib"])
        L_LTE = 10.0 ** (-v) * jnp.exp(-2325.0 / T)
        return L0, L_LTE


class NeufeldCO:
    def __init__(self):
        self.d = _load("neufeld_co")

    def params(self, T, log10N):
        d = self.d
        lnT = jnp.log(jnp.maximum(T, 1e-30))
        hi = T >= 100.0
        v_L0 = jnp.where(
            hi, _lin_extrap(lnT, jnp.log(d["T_high"]), d["log10_L0_high"]),
            _lin_extrap(T, d["T_low"], d["log10_L0_low"]))
        v_LTE = jnp.where(
            hi, _bilin_extrap(lnT, log10N, jnp.log(d["T_high"]),
                              d["log10N_high"], d["log10_L_LTE_high"]),
            _bilin_extrap(lnT, log10N, jnp.log(d["T_low"]),
                          d["log10N_low"], d["log10_L_LTE_low"]))
        v_n12 = jnp.where(
            hi, _bilin_extrap(lnT, log10N, jnp.log(d["T_high"]),
                              d["log10N_high"], d["log10_n_12_high"]),
            _bilin_extrap(lnT, log10N, jnp.log(d["T_low"]),
                          d["log10N_low"], d["log10_n_12_low"]))
        v_al = jnp.where(
            hi, _bilin_extrap(lnT, log10N, jnp.log(d["T_high"]),
                              d["log10N_high"], d["alpha_high"]),
            _bilin_extrap(lnT, log10N, jnp.log(d["T_low"]),
                          d["log10N_low"], d["alpha_low"]))
        return NeufeldParams(10.0 ** (-v_L0), 10.0 ** (-v_LTE),
                             10.0 ** (-v_n12), v_al)

    def vib_params(self, T, log10N):
        d = self.d
        T = jnp.maximum(T, 1e-30)
        L0 = 1.83e-26 * T * jnp.exp(-68.0 * T ** (-1.0 / 3.0) - 3080.0 / T)
        v = _bilin_extrap(jnp.log(T), log10N, jnp.log(d["T_high_vib"]),
                          d["log10N_high_vib"], d["log10_X_L_LTE_high_vib"])
        L_LTE = 10.0 ** (-v) * jnp.exp(-3080.0 / T)
        return L0, L_LTE


class VisserCOShielding:
    """Visser et al. 2009 12CO photodissociation shielding factor."""

    def __init__(self):
        d = _load("visser_co_shielding")
        self.logN_H2 = d["logN_H2"]
        self.logN_CO = d["logN_12CO"]
        self.logf = jnp.log(d["f_12CO"])  # [n_CO, n_H2]

    def shielding(self, N_H2, N_CO):
        x = jnp.log10(jnp.maximum(N_CO, 1.0))
        y = jnp.log10(jnp.maximum(N_H2, 1.0))
        return jnp.exp(_bilin_extrap(x, y, self.logN_CO, self.logN_H2,
                                     self.logf))


# --------------------------------------------------------------------------
# Ion cooling lookup tables (NII / SiII / FeII): binary 2D tables in
# (log10 ne, log10 T) -> log10 Lambda, read from the reference-format
# stream-of-doubles files (reference src/binary_array_io.f90:19-60).
# --------------------------------------------------------------------------

class IonCoolingLUT:
    # host-side cubic-spline refinement factor of the raw (ne, T) grid.
    # The reference evaluates a 2D cubic spline directly
    # (src/heating_cooling.f90:832-839, src/interpolation.f90:25); pure
    # bilinear on the raw 50x60 grid deviates up to 21% (Fe+) from that
    # spline, so the table is presampled through the same cubic spline
    # onto a denser grid at load time — bilinear error scales h^2, so
    # 6x refinement brings the on-device gather within <1% of the
    # reference's spline while staying a branch-free TPU lookup.
    REFINE = 6

    def __init__(self, path):
        raw = np.fromfile(path, dtype="<f8")
        ndim = int(raw[0])
        dims = raw[1:1 + ndim].astype(int)
        nx, ny = int(dims[0]), int(dims[1])
        o = 1 + ndim
        x = raw[o:o + nx]
        y = raw[o + nx:o + nx + ny]
        val = raw[o + nx + ny:o + nx + ny + nx * ny].reshape((ny, nx)).T
        if self.REFINE > 1:
            from scipy.interpolate import RectBivariateSpline
            sp = RectBivariateSpline(x, y, val, kx=3, ky=3)
            x = np.linspace(x[0], x[-1], nx * self.REFINE)
            y = np.linspace(y[0], y[-1], ny * self.REFINE)
            val = sp(x, y)
        self.log_ne = jnp.asarray(x)
        self.log_T = jnp.asarray(y)
        self.val = jnp.asarray(val)   # [nx, ny] log10 Lambda per ion

    def cooling_per_ion(self, ne, T):
        """10**LUT(log10 ne, log10 T), clamped at the table edges.

        Bilinear gather on the spline-refined grid (see REFINE above) —
        equivalent to the reference's cubic spline to <1%.
        """
        x = jnp.clip(jnp.log10(jnp.maximum(ne, 1e-300)),
                     self.log_ne[0], self.log_ne[-1])
        y = jnp.clip(jnp.log10(jnp.maximum(T, 1e-300)),
                     self.log_T[0], self.log_T[-1])
        v = _bilin_extrap(x, y, self.log_ne, self.log_T, self.val)
        return 10.0 ** v
