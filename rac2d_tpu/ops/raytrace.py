"""Image synthesis: formal solution of the transfer equation along rays.

Rebuild of the reference ray tracer (reference: src/ray_tracing.f90:258-334
``make_a_cube``, :367-564 ``integerate_a_ray``, :569-662 the per-cell
Doppler-substepped line integration and ``integrate_one_step``;
dust emissivity :338-364).

TPU inversion: pixels x channels become a vmapped batch; the cell-by-cell
march along each ray is a while_loop with all nf channels advanced as a
vector; the reference's adaptive Doppler subdivision becomes a fixed
NSUB-substep evaluation (activated per cell when the line shifts through
the channel), keeping shapes static for XLA.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from . import geometry

# Doppler sub-segments per cell crossing.  The reference adaptively
# splits the path whenever the local line frequency crosses the channel
# (ray_tracing.f90:569-621) and evaluates the profile POINTWISE per
# sub-segment; here each sub-segment instead uses the erf-integrated mean
# Gaussian profile, which is EXACT for a linearly-varying Doppler shift —
# so a few segments (capturing curvature of v(l)) replace the reference's
# many, and fast inner-disk shear cannot skip over the line core no
# matter how large the per-cell shift is.
NSUB = 32


class RtCells(NamedTuple):
    """Per-cell state for imaging (device arrays)."""
    rmin: jnp.ndarray
    rmax: jnp.ndarray
    zmin: jnp.ndarray
    zmax: jnp.ndarray
    using: jnp.ndarray
    Tdusts: jnp.ndarray       # [n_dust, n]
    rho_dust: jnp.ndarray     # [n_dust, n]
    n_mol: jnp.ndarray        # [n] number density of the imaged molecule
    f_up: jnp.ndarray         # [n] upper-level population fraction
    f_low: jnp.ndarray        # [n]
    dv: jnp.ndarray           # [n] local line width (cm/s)


class RtModel(NamedTuple):
    gi: geometry.GridIndex
    cells: RtCells
    # dust opacity interpolated per channel: [n_dust, nf]
    kext_dust: jnp.ndarray
    star_mass: float
    # line parameters (scalars; zeros for continuum-only)
    f0: float
    Aul: float
    Bul: float
    Blu: float


def _doppler_nu(star_mass, nu0, x, y, z, vx, vy):
    rr = x * x + y * y
    r3 = jnp.sqrt(rr + z * z)
    v = jnp.sqrt((c.GravitationConst_CGS * c.Msun_CGS / c.AU2cm)
                 * star_mass / jnp.maximum(r3, 1e-30))
    vd = (-y * vx + x * vy) * v / jnp.sqrt(jnp.maximum(rr, 1e-30))
    return nu0 * (1.0 - vd / c.SpeedOfLight_CGS)


def _step_I(Inu, jnu, knu, dl):
    """One uniform-slab update (reference integrate_one_step,
    ray_tracing.f90:642-662)."""
    S = jnu / (knu + 1e-100)
    tau = knu * dl
    t1 = jnp.exp(-jnp.clip(tau, -200.0, 200.0))
    gen = Inu * t1 + S * (1.0 - t1)
    thin = Inu * (1.0 - tau) + jnu * dl
    Inu_new = jnp.where(tau >= 1e-4, jnp.where(tau >= 50.0, S, gen),
                        jnp.where(tau < 0.0, gen, thin))
    return Inu_new, tau


@partial(jax.jit, static_argnames=("is_line", "max_cross"))
def integrate_ray(model: RtModel, x0, y0, z0, vx, vy, vz, freqs, Inu0,
                  is_line: bool = True, max_cross: int = 10_000):
    """Formal solution along one ray for all nf channels.

    Returns (Inu [nf], tau_max, Nup, Nlow).
    """
    cells = model.cells
    gi = model.gi
    nf = freqs.shape[0]
    n_cells = cells.rmin.shape[0]

    # enter the domain
    B = jnp.float64
    dom = (jnp.asarray(gi.rmin_dom), jnp.asarray(gi.rmax_dom),
           jnp.asarray(0.0), jnp.asarray(gi.zmax_dom))
    length, eps, dirtype, found = geometry.ray_cell_exit_mirror(
        x0, y0, z0, vx, vy, vz, *dom)
    x = x0 + vx * (length + eps)
    y = y0 + vy * (length + eps)
    z = z0 + vz * (length + eps)
    cell0 = geometry.locate(gi, x * x + y * y, jnp.abs(z))

    def cond(st):
        i, x, y, z, cell, Inu, taus, Nup, Nlow = st
        return (i < max_cross) & (cell >= 0)

    def body(st):
        i, x, y, z, cell, Inu, taus, Nup, Nlow = st
        cl = jnp.clip(cell, 0, n_cells - 1)
        length, eps, dirtype, found = geometry.ray_cell_exit_mirror(
            x, y, z, vx, vy, vz, cells.rmin[cl], cells.rmax[cl],
            cells.zmin[cl], cells.zmax[cl])
        use = cells.using[cl] & found
        dl_cm = length * c.AU2cm

        # continuum emissivity/extinction per channel
        jc = jnp.zeros(nf)
        kc = jnp.zeros(nf)
        n_dust = cells.rho_dust.shape[0]
        for d in range(n_dust):
            Td = cells.Tdusts[d, cl]
            kext = model.kext_dust[d] * cells.rho_dust[d, cl]
            from ..utils.planck import B_nu
            Bd = B_nu(jnp.maximum(Td, 1e-10), freqs)
            on = Td > 0.0
            jc = jc + jnp.where(on, Bd * kext, 0.0)
            kc = kc + jnp.where(on, kext, 0.0)

        if is_line:
            yup = cells.f_up[cl]
            ylow = cells.f_low[cl]
            nmol = cells.n_mol[cl]
            width_nu = model.f0 * cells.dv[cl] / c.SpeedOfLight_CGS
            t1 = c.hPlanck_CGS * model.f0 / (4.0 * jnp.pi) * nmol \
                / (c.sqrt_2pi * width_nu)
            line_k = t1 * (ylow * model.Blu - yup * model.Bul)
            line_j = t1 * yup * model.Aul
            # sub-segment boundaries along the crossing
            dsub = length / NSUB
            ledges = jnp.arange(NSUB + 1) * dsub

            # vectorized over channels via vmap with per-channel continuum
            def chan2(nu_obs, I0, jcc, kcc):
                def xarg_at(lm):
                    nu_loc = _doppler_nu(model.star_mass, nu_obs,
                                         x + vx * lm, y + vy * lm,
                                         z + vz * lm, vx, vy)
                    return (nu_loc - model.f0) / width_nu

                xedges = jax.vmap(xarg_at)(ledges)

                def sub(carry, ab):
                    I, tau = carry
                    x0a, x1a = ab
                    dx = x1a - x0a
                    # mean of exp(-x^2/2) over [x0, x1]: erf-integrated
                    # (exact for linear nu(l)); midpoint value when the
                    # shift across the segment is negligible
                    s2 = jnp.sqrt(0.5)
                    erf_term = (jax.scipy.special.erf(x1a * s2)
                                - jax.scipy.special.erf(x0a * s2))
                    mean_erf = jnp.sqrt(jnp.pi / 2.0) * erf_term \
                        / jnp.where(jnp.abs(dx) > 1e-6, dx, 1.0)
                    xm = 0.5 * (x0a + x1a)
                    mean_mid = jnp.exp(-0.5 * jnp.clip(xm * xm, 0.0,
                                                       400.0))
                    prof = jnp.where(jnp.abs(dx) > 1e-6, mean_erf,
                                     mean_mid)
                    prof = jnp.clip(prof, 0.0, 1.0)
                    jnu = prof * line_j + jcc
                    knu = prof * line_k + kcc
                    I2, dtau = _step_I(I, jnu, knu, dl_cm / NSUB)
                    return (I2, tau + dtau), None

                (I2, tau2), _ = jax.lax.scan(
                    sub, (I0, 0.0), (xedges[:-1], xedges[1:]))
                return I2, tau2

            Inu2, dtau = jax.vmap(chan2)(freqs, Inu, jc, kc)
            Nup2 = Nup + nmol * length * c.AU2cm * yup
            Nlow2 = Nlow + nmol * length * c.AU2cm * ylow
        else:
            Inu2, dtau = jax.vmap(lambda I0, jcc, kcc: _step_I(
                I0, jcc, kcc, dl_cm))(Inu, jc, kc)
            Nup2, Nlow2 = Nup, Nlow

        Inu_n = jnp.where(use, Inu2, Inu)
        taus_n = jnp.where(use, taus + dtau, taus)
        Nup_n = jnp.where(use & jnp.array(is_line), Nup2, Nup)
        Nlow_n = jnp.where(use & jnp.array(is_line), Nlow2, Nlow)

        xn = x + vx * (length + eps)
        yn = y + vy * (length + eps)
        zn = z + vz * (length + eps)
        new_cell = geometry.locate(gi, xn * xn + yn * yn, jnp.abs(zn))
        new_cell = jnp.where(found, new_cell, -1)
        return (i + 1, xn, yn, zn, new_cell, Inu_n, taus_n, Nup_n, Nlow_n)

    init = (jnp.array(0), x, y, z, cell0, Inu0, jnp.zeros(nf),
            jnp.zeros(()), jnp.zeros(()))
    _, _, _, _, _, Inu, taus, Nup, Nlow = jax.lax.while_loop(
        cond, body, init)
    tau_line = jnp.max(taus) - 0.25 * (taus[0] + taus[1]
                                       + taus[-2] + taus[-1])
    return Inu, tau_line, Nup, Nlow


def make_cube(model: RtModel, view_theta_deg, xs, ys, freqs,
              is_line=True, chunk=512):
    """Position-position-frequency cube [nx, ny, nf] plus tau/Ncol maps.

    xs, ys: image-plane coordinates (AU).  The ray direction and origin
    rotation follow reference make_a_cube (ray_tracing.f90:277-315).
    """
    th = np.deg2rad(view_theta_deg)
    ct, st = np.cos(th), np.sin(th)
    zfar = -float(model.gi.rmax_dom) * 5.0
    vx, vy, vz = 0.0, -st, ct
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    px = X.ravel()
    py = Y.ravel() * ct - zfar * st
    pz = Y.ravel() * st + zfar * ct
    from ..utils.planck import B_nu
    Inu0 = jnp.asarray(np.array(B_nu(c.CMB_T, np.asarray(freqs))))
    nf = len(freqs)
    npix = len(px)
    out_I = np.zeros((npix, nf))
    out_tau = np.zeros(npix)
    out_Nu = np.zeros(npix)
    out_Nl = np.zeros(npix)
    fr = jnp.asarray(freqs)
    ray_fn = jax.jit(jax.vmap(
        lambda x, y, z: integrate_ray(
            model, x, y, z, jnp.asarray(vx), jnp.asarray(vy),
            jnp.asarray(vz), fr, Inu0, is_line=is_line)))
    for lo in range(0, npix, chunk):
        sl = slice(lo, min(lo + chunk, npix))
        I, tau, Nu, Nl = ray_fn(jnp.asarray(px[sl]), jnp.asarray(py[sl]),
                                jnp.asarray(pz[sl]))
        out_I[sl] = np.asarray(I)
        out_tau[sl] = np.asarray(tau)
        out_Nu[sl] = np.asarray(Nu)
        out_Nl[sl] = np.asarray(Nl)
    nx, ny = len(xs), len(ys)
    return (out_I.reshape(nx, ny, nf), out_tau.reshape(nx, ny),
            out_Nu.reshape(nx, ny), out_Nl.reshape(nx, ny))
