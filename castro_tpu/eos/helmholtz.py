"""Helmholtz-class stellar EOS: ions + radiation + tabulated
electron-positron gas.

Reference: Microphysics eos/helmholtz (Timmes & Swesty 2000), used by 21
reference problems (SURVEY.md L0b). The electron table here is generated
from relativistic Fermi-Dirac integrals at build time
(helmholtz_table.py) rather than read from helm_table.dat; interpolation
is Catmull-Rom bicubic in (log10 rho*Ye, log10 T) with analytic
interpolant derivatives for chi_T / c_v (C^1, so sound speeds are
smooth). Coulomb corrections follow the Chabrier & Potekhin (1998)
one-component-plasma free-energy fit as used by Timmes & Swesty (2000):
the weak-coupling (Gamma < 1) Debye-Hueckel-like branch and the
strong-coupling branch in Gamma^(1/4), with the reference's guard that
disables the correction wherever it would drive p or e negative
(`use_coulomb` toggles, default on as in Microphysics eos/helmholtz).

Components:
    p = p_ion + p_rad + p_ele;  p_ion = rho k T N_A / abar
    e = e_ion + e_rad + e_ele;  e_rad = a T^4 / rho, p_rad = a T^4 / 3
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.eos.base import Eos, EosState
from castro_tpu.eos import helmholtz_table as htab
from castro_tpu.utils import constants as C


def _cr_weights(t):
    """Catmull-Rom cubic weights + derivative weights for fraction t."""
    t2 = t * t
    t3 = t2 * t
    w = (
        -0.5 * t3 + t2 - 0.5 * t,
        1.5 * t3 - 2.5 * t2 + 1.0,
        -1.5 * t3 + 2.0 * t2 + 0.5 * t,
        0.5 * t3 - 0.5 * t2,
    )
    dw = (
        -1.5 * t2 + 2.0 * t - 0.5,
        4.5 * t2 - 5.0 * t,
        -4.5 * t2 + 4.0 * t + 0.5,
        1.5 * t2 - 1.0 * t,
    )
    return w, dw


class _Bicubic:
    """Catmull-Rom bicubic interpolation of a 2D table with derivatives."""

    def __init__(self, x0, dx, y0, dy, table):
        self.x0, self.dx = float(x0), float(dx)
        self.y0, self.dy = float(y0), float(dy)
        self.table = jnp.asarray(table)
        self.nx, self.ny = table.shape

    def __call__(self, x, y):
        """Returns (f, df/dx, df/dy)."""
        fx = jnp.clip((x - self.x0) / self.dx, 1.0, self.nx - 3.0 - 1e-6)
        fy = jnp.clip((y - self.y0) / self.dy, 1.0, self.ny - 3.0 - 1e-6)
        ix = jnp.floor(fx).astype(jnp.int32)
        iy = jnp.floor(fy).astype(jnp.int32)
        tx = fx - ix
        ty = fy - iy
        wx, dwx = _cr_weights(tx)
        wy, dwy = _cr_weights(ty)

        f = 0.0
        dfx = 0.0
        dfy = 0.0
        for a in range(4):
            row_f = 0.0
            row_dy = 0.0
            for b in range(4):
                v = self.table[ix + a - 1, iy + b - 1]
                row_f = row_f + wy[b] * v
                row_dy = row_dy + dwy[b] * v
            f = f + wx[a] * row_f
            dfx = dfx + dwx[a] * row_f
            dfy = dfy + wx[a] * row_dy
        return f, dfx / self.dx, dfy / self.dy


# Chabrier & Potekhin (1998) OCP fit constants (strong / weak coupling)
_CP_A1, _CP_B1, _CP_C1, _CP_D1, _CP_E1 = (-0.898004, 0.96786, 0.220703,
                                          -0.86097, 2.5269)
_CP_A2, _CP_B2, _CP_C2 = 0.29561, 1.9885, 0.288675


def _coulomb_terms(rho, T, abar, zbar):
    """Coulomb p, e and their T/rho derivatives (per CP98/helmholtz):
    plasg = zbar^2 e^2 / (kT a_i), a_i the ion-sphere radius."""
    kavo = C.k_B * C.N_A
    ytot = 1.0 / abar
    n_i43 = 4.0 * np.pi / 3.0 * C.N_A * rho * ytot  # (4pi/3) n_i
    lami_inv = n_i43 ** (1.0 / 3.0)  # 1 / a_i
    plasg = zbar * zbar * C.q_e * C.q_e * lami_inv / (C.k_B * T)
    plasg = jnp.clip(plasg, 1e-30, 1e30)

    # strong coupling (Gamma >= 1)
    x = plasg ** 0.25
    y = kavo * ytot * T  # N_A k T / abar (erg/g)
    g_s = _CP_A1 * plasg + _CP_B1 * x + _CP_C1 / x + _CP_D1
    gp_s = _CP_A1 * plasg + 0.25 * _CP_B1 * x - 0.25 * _CP_C1 / x  # Gamma g'
    e_s = y * g_s
    p_s = rho * e_s / 3.0
    dedT_s = kavo * ytot * (g_s - gp_s)          # d/dT with Gamma ~ 1/T
    dpdT_s = rho * dedT_s / 3.0
    dpdr_s = e_s / 3.0 + y * gp_s / 9.0          # Gamma ~ rho^{1/3}

    # weak coupling (Gamma < 1)
    x3 = plasg * jnp.sqrt(plasg)
    yb = plasg ** _CP_B2
    z_w = _CP_C2 * x3 - _CP_A2 / 3.0 * yb
    zp_w = 1.5 * _CP_C2 * x3 - _CP_B2 * _CP_A2 / 3.0 * yb  # Gamma z'
    pion = rho * kavo * T * ytot
    p_w = -pion * z_w
    e_w = 3.0 * p_w / rho
    dpdT_w = -(pion / T) * (z_w - zp_w)
    dedT_w = 3.0 * dpdT_w / rho
    dpdr_w = p_w / rho - pion * zp_w / (3.0 * rho)

    strong = plasg >= 1.0
    p_c = jnp.where(strong, p_s, p_w)
    e_c = jnp.where(strong, e_s, e_w)
    dpdT_c = jnp.where(strong, dpdT_s, dpdT_w)
    dedT_c = jnp.where(strong, dedT_s, dedT_w)
    dpdr_c = jnp.where(strong, dpdr_s, dpdr_w)
    return p_c, e_c, dpdT_c, dedT_c, dpdr_c


class HelmholtzEos(Eos):
    def __init__(self, network=None, table=None, use_coulomb=True):
        self.network = network
        self.use_coulomb = bool(use_coulomb)
        t = table if table is not None else htab.build_table()
        dx = t["logd"][1] - t["logd"][0]
        dy = t["logt"][1] - t["logt"][0]
        self._pe = _Bicubic(t["logd"][0], dx, t["logt"][0], dy, t["logp"])
        self._ee = _Bicubic(t["logd"][0], dx, t["logt"][0], dy, t["loge"])
        self._logd_lo = float(t["logd"][0])
        self._logt_lo = float(t["logt"][0])

    def _abar_zbar(self, xn):
        if xn is None or self.network is None:
            return jnp.asarray(1.0), jnp.asarray(1.0)
        aion = self.network.aion.reshape((-1,) + (1,) * (xn.ndim - 1))
        zion = self.network.zion.reshape((-1,) + (1,) * (xn.ndim - 1))
        abar = 1.0 / jnp.sum(xn / aion, axis=0)
        zbar = abar * jnp.sum(xn * zion / aion, axis=0)
        return abar, zbar

    def rt(self, rho, T, xn=None) -> EosState:
        rho = jnp.asarray(rho)
        T = jnp.maximum(jnp.asarray(T), 10.0 ** (self._logt_lo + 0.01))
        abar, zbar = self._abar_zbar(xn)
        ye = zbar / abar

        # ions (ideal)
        kavo = C.k_B * C.N_A
        p_ion = rho * kavo * T / abar
        e_ion = 1.5 * kavo * T / abar
        dpdT_ion = rho * kavo / abar
        dedT_ion = 1.5 * kavo / abar
        dpdr_ion = kavo * T / abar

        # radiation
        p_rad = C.a_rad * T**4 / 3.0
        e_rad = C.a_rad * T**4 / rho
        dpdT_rad = 4.0 * C.a_rad * T**3 / 3.0
        dedT_rad = 4.0 * C.a_rad * T**3 / rho
        dpdr_rad = jnp.zeros_like(rho)

        # electrons (table): logs of P_e, E_e(volume) vs log(rho Ye), log T
        ld = jnp.log10(jnp.maximum(rho * ye, 10.0 ** (self._logd_lo + 0.01)))
        lt = jnp.log10(T)
        lp, dlp_dld, dlp_dlt = self._pe(ld, lt)
        le, dle_dld, dle_dlt = self._ee(ld, lt)
        p_ele = 10.0**lp
        Evol = 10.0**le
        e_ele = Evol / rho
        # d(log10 f)/d(log10 x) -> df/dx = f * dlf_dlx / x
        dpdT_ele = p_ele * dlp_dlt / T
        dpdr_ele = p_ele * dlp_dld / rho
        dedT_ele = e_ele * dle_dlt / T
        dedr_ele = e_ele * (dle_dld - 1.0) / rho

        p = p_ion + p_rad + p_ele
        e = e_ion + e_rad + e_ele
        dpdT = dpdT_ion + dpdT_rad + dpdT_ele
        dpdr = dpdr_ion + dpdr_rad + dpdr_ele
        cv = dedT_ion + dedT_rad + dedT_ele

        if self.use_coulomb:
            # Coulomb corrections, disabled pointwise where they would
            # drive p or e negative (the helmholtz.f90 guard)
            p_c, e_c, dpdT_c, dedT_c, dpdr_c = _coulomb_terms(
                rho, T, abar, zbar)
            ok = (p + p_c > 0.0) & (e + e_c > 0.0)
            zero = jnp.zeros_like(p)
            p = p + jnp.where(ok, p_c, zero)
            e = e + jnp.where(ok, e_c, zero)
            dpdT = dpdT + jnp.where(ok, dpdT_c, zero)
            dpdr = dpdr + jnp.where(ok, dpdr_c, zero)
            cv = cv + jnp.where(ok, dedT_c, zero)

        cv = jnp.maximum(cv, 1e-30)
        dedr_T = dedr_ele - e_rad / rho

        chi_t = dpdT * T / p
        chi_r = dpdr * rho / p
        gam3m1 = p * chi_t / (rho * T * cv)
        gam1 = chi_r + chi_t * gam3m1
        gam1 = jnp.clip(gam1, 1.01, 3.0)
        cs = jnp.sqrt(gam1 * p / rho)
        cp = cv * gam1 / chi_r

        dpdr_e = dpdr - dpdT * dedr_T / cv  # (dp/drho)|e via chain rule
        return EosState(
            rho=rho, T=T, p=p, e=e, h=e + p / rho, gam1=gam1, cs=cs,
            dpdr_e=dpdr_e,
            dpde=dpdT / cv, dpdT=dpdT, dedT=cv, cv=cv, cp=cp,
            mu=abar / (1.0 + zbar), abar=abar, zbar=zbar,
        )

    def _invert(self, rho, target, xn, getter, T_guess=None, iters=10):
        T = jnp.full_like(jnp.asarray(rho) * 1.0, 1e7) if T_guess is None else T_guess

        def body(i, T):
            s = self.rt(rho=rho, T=T, xn=xn)
            f, dfdT = getter(s)
            Tn = T - (f - target) / jnp.maximum(dfdT, 1e-300)
            return jnp.clip(Tn, 0.5 * T, 2.0 * T)

        T = jax.lax.fori_loop(0, iters, body, T)
        return self.rt(rho=rho, T=T, xn=xn)

    def re(self, rho, e, xn=None, T_guess=None) -> EosState:
        return self._invert(rho, e, xn, lambda s: (s.e, s.dedT), T_guess, 12)

    def rp(self, rho, p, xn=None, T_guess=None) -> EosState:
        return self._invert(rho, p, xn, lambda s: (s.p, s.dpdT), T_guess, 12)

    def rh(self, rho, h, xn=None) -> EosState:
        return self._invert(rho, h, xn,
                            lambda s: (s.h, s.dedT + s.dpdT / s.rho), None, 12)

    def tp(self, T, p, xn=None) -> EosState:
        # Newton on rho
        rho = jnp.full_like(jnp.asarray(p) * 1.0, 1.0)

        def body(i, rho):
            s = self.rt(rho=rho, T=T, xn=xn)
            dpdr = s.dpdr_e
            rn = rho - (s.p - p) / jnp.maximum(dpdr, 1e-300)
            return jnp.clip(rn, 0.1 * rho, 10.0 * rho)

        rho = jax.lax.fori_loop(0, 15, body, rho)
        return self.rt(rho=rho, T=T, xn=xn)
