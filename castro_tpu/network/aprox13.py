"""aprox13: 13-isotope alpha-chain network (He4 .. Ni56).

Reference: Microphysics networks/aprox13 (Timmes' approx13), used by the
wdmerger / flame_wave science problems (SURVEY.md A5); burned via
`burner()` from `Source/reactions/Castro_react.cpp:123`.

Rate provenance (the Microphysics submodule is empty in this checkout, so
rates are implemented from their published sources rather than ported):

- triple-alpha           : classic high-T fit (Kippenhahn & Weigert eq.
                           18.68; CF88 composite), valid T9 >~ 0.08
- c12(a,g)o16            : CF88 analytic fit x 1.7 (the Weaver & Woosley
                           normalization aprox13 adopts)
- c12+c12 -> ne20+a      : CF88
- c12+o16 -> mg24+a      : CF88
- o16+o16 -> si28+a      : CF88
- o16(a,g)ne20           : CF88
- ne20(a,g)mg24          : CF88
- mg24(a,g)si28          : CF88 resonant terms (leading terms)
- si28..fe52 (a,g)       : published WFHZ78 fits (`rates_heavy.py`),
                           reverse coefficients recomputed exactly from
                           detailed balance (match the published constants
                           to <0.3%, see rates_heavy docstring)
- reverse (photodisintegration) rates: detailed balance,
                           rev = 9.8685e9 T9^(3/2) (A1 A2 / A12)^(3/2)
                                 exp(-Q/kT) * fwd  (ground-state spins;
                           partition functions ~1 below T9 ~ 5, all
                           even-even 0+ nuclei here)
- screening              : Graboske et al. (1973) weak screening
                           H12 = 0.188 Z1 Z2 sqrt(rho zeta) T6^(-3/2),
                           zeta = sum (Z^2 + Z) Y, joined to CP98
                           ion-sphere strong screening by pointwise min
                           (`network/screening.py`)

- (a,p)(p,g) effective links Si28..Ni56: the aprox13 flow pattern
  k + a -> I + p -> (k+1) + g with the intermediate odd-Z nucleus
  (P31, Cl35, K39, Sc43, V47, Mn51, Co55) in proton-branching steady
  state: net forward rate = lam_ap * frac_pg with
  frac_pg = lam_pg / (lam_pg + lam_pa) (the rho*Y_p factor cancels in
  the branch), and the reverse (g,p)(p,a) flow via detailed balance.
  Q-values are exact (AME mass excesses); the exothermic direction of
  each link uses the published WFHZ78 fit (`rates_heavy.py`), the
  endothermic direction exact detailed balance (spins + masses).
- thermal neutrino losses: `castro_tpu/network/neutrino.py` (Itoh et al.
  1996 pair + brems channels; sneut5's photo/plasma/recombination
  channels documented as omitted there).

The RHS is fully vectorized over zones and autodiff-friendly (the stiff
integrator takes Jacobians with jacfwd).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.network.base import Network
from castro_tpu.utils import constants as C

_SPECIES = ("He4", "C12", "O16", "Ne20", "Mg24", "Si28", "S32",
            "Ar36", "Ca40", "Ti44", "Cr48", "Fe52", "Ni56")
_A = np.array([4, 12, 16, 20, 24, 28, 32, 36, 40, 44, 48, 52, 56], dtype=float)
_Z = np.array([2, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26, 28], dtype=float)
# total nuclear binding energies (MeV)
_B_MEV = np.array([28.29603, 92.16294, 127.62093, 160.64788, 198.25790,
                   236.53790, 271.78250, 306.72020, 342.05680, 375.47720,
                   411.46900, 447.70800, 483.99500])

# Q-values of k + He4 -> k+1 captures (MeV), from the binding energies
_Q_AG = np.array([_B_MEV[k + 1] - _B_MEV[k] - _B_MEV[0]
                  for k in range(1, 12)])

_T9_FLOOR = 1.0e-3

# intermediate odd-Z nuclei of the (a,p)(p,g) links k -> I -> k+1 for
# k = Si28..Fe52 (chain index 5..11): (name, Z, A, Q_ap, Q_pg) [MeV],
# Q-values from AME mass excesses (see docstring check values)
_AP_LINKS = {
    5: ("P31", 15.0, 31.0, -1.916, 8.864),
    6: ("Cl35", 17.0, 35.0, -1.866, 8.505),
    7: ("K39", 19.0, 39.0, -1.287, 8.328),
    8: ("Sc43", 21.0, 43.0, -3.522, 8.649),
    9: ("V47", 23.0, 47.0, -0.410, 8.106),
    10: ("Mn51", 25.0, 51.0, 0.558, 7.380),
    11: ("Co55", 27.0, 55.0, 0.832, 7.165),
}


def _gamow(z1, z2, a1, a2, S, T9):
    """Non-resonant charged-particle rate N_A<sigma v> (Gamow-window
    closed form with constant astrophysical S-factor [MeV b])."""
    ahat = a1 * a2 / (a1 + a2)
    tau = 4.2487 * (z1 * z1 * z2 * z2 * ahat / T9) ** (1.0 / 3.0)
    pref = 7.83e9 * (z1 * z2 / (ahat * T9 * T9)) ** (1.0 / 3.0) * S
    return pref * jnp.exp(-tau)


def _gamow_ag(k, T9):
    """k(a,g)k+1 forward rate for the heavy chain (k = 5..11): the
    published WFHZ78 fits (rates_heavy.py). Name kept for the iso7 /
    aprox19 importers that predate the tabulated-fit upgrade."""
    from castro_tpu.network.rates_heavy import heavy_ag

    return heavy_ag(k, T9)


def _rev_2body(T9, q_mev, a1, a2, a3, a4):
    """Detailed-balance ratio lam(3+4->1+2)/lam(1+2->3+4) for a 2<->2
    reaction with Q = Q(1+2->3+4): (A1 A2/(A3 A4))^1.5 exp(-Q/kT)
    (partition-function ratios ~ 1)."""
    return ((a1 * a2) / (a3 * a4)) ** 1.5 * jnp.exp(
        jnp.maximum(-q_mev * 11.6045 / T9, -200.0))


def _exp_rate(lograte):
    """exp of a log-space rate, clamped to f32-safe range: underflow to
    zero is physical (cold zones), overflow must not reach inf because a
    downstream inf*0 makes NaN (the f32 full-physics failure mode)."""
    return jnp.exp(jnp.clip(lograte, -200.0, 85.0))


def _cf88_rates(T9):
    """The CF88 analytic fits (N_A<sigma v>, cm^3/mol/s). Returns a dict.

    The heavy-ion fusion fits carry prefactors up to 7.1e36; evaluated
    directly, `prefactor * T9^{-2/3}` overflows float32 at low T9 and the
    subsequent multiply by the underflowed exp() factor yields NaN — so
    every rate with a prefactor near the f32 ceiling is evaluated in log
    space (the production TPU dtype is f32)."""
    import math as _m

    T913 = T9 ** (1.0 / 3.0)
    T923 = T913 * T913
    T932 = T9 * jnp.sqrt(T9)
    T9m13 = 1.0 / T913
    T9m23 = 1.0 / T923
    T9m32 = 1.0 / T932
    lnT9 = jnp.log(T9)

    r = {}

    # c12(a,g)o16 — CF88 x 1.7 (Weaver-Woosley/aprox13 normalization)
    t1 = 1.04e8 / (T9 * T9 * (1.0 + 0.0489 * T9m23) ** 2) * \
        jnp.exp(-32.120 * T9m13 - (T9 / 3.496) ** 2)
    t2 = 1.76e8 / (T9 * T9 * (1.0 + 0.2654 * T9m23) ** 2) * \
        jnp.exp(-32.120 * T9m13)
    t3 = 1.25e3 * T9m32 * jnp.exp(-27.499 / T9)
    t4 = 1.43e-2 * T9 ** 5 * jnp.exp(-15.541 / T9)
    r["c12ag"] = 1.7 * (t1 + t2 + t3 + t4)

    # c12 + c12 -> ne20 + a — CF88 (log form)
    T9a = T9 / (1.0 + 0.0396 * T9)
    r["c12c12"] = _exp_rate(
        _m.log(4.27e26) + (5.0 / 6.0) * jnp.log(T9a) - 1.5 * lnT9
        - 84.165 / T9a ** (1.0 / 3.0) - 2.12e-3 * T9 ** 3)

    # c12 + o16 -> mg24 + a — CF88 (T9 > 0.5 fit; log form)
    T9b = T9 / (1.0 + 0.055 * T9)
    den_co = jnp.exp(-0.18 * T9b * T9b) + 1.06e-3 * jnp.exp(
        jnp.minimum(2.562 * T9b ** (2.0 / 3.0), 85.0))
    r["c12o16"] = _exp_rate(
        _m.log(1.72e31) + (5.0 / 6.0) * jnp.log(T9b) - 1.5 * lnT9
        - 106.594 / T9b ** (1.0 / 3.0) - jnp.log(den_co))

    # o16 + o16 -> si28 + a — CF88 (log form)
    r["o16o16"] = _exp_rate(
        _m.log(7.10e36) - (2.0 / 3.0) * lnT9
        - 135.93 * T9m13 - 0.629 * T923 - 0.445 * T923 * T923 +
        0.0103 * T9 * T9)

    # o16(a,g)ne20 — CF88
    r["o16ag"] = (9.37e9 * T9m23 * jnp.exp(-39.757 * T9m13 -
                                           (T9 / 1.586) ** 2)
                  + 62.1 * T9m32 * jnp.exp(-10.297 / T9)
                  + 538.0 * T9m32 * jnp.exp(-12.226 / T9)
                  + 13.0 * T9 * T9 * jnp.exp(-20.093 / T9))

    # ne20(a,g)mg24 — CF88
    r["ne20ag"] = (4.11e11 * T9m23 * jnp.exp(-46.766 * T9m13 -
                                             (T9 / 2.219) ** 2) *
                   (1.0 + 0.009 * T913 + 0.882 * T923 + 0.055 * T9 +
                    0.749 * T9 * T913 + 0.119 * T9 * T923)
                   + 5.27e3 * T9m32 * jnp.exp(-15.869 / T9)
                   + 6.51e3 * jnp.sqrt(T9) * jnp.exp(-16.223 / T9))

    # mg24(a,g)si28 — CF88 resonant terms
    r["mg24ag"] = (4.78e1 * T9m32 * jnp.exp(-13.506 / T9)
                   + 2.38e3 * T9m32 * jnp.exp(-15.218 / T9)
                   + 2.47e2 * T932 * jnp.exp(-15.147 / T9))
    return r


class Aprox13Network(Network):
    reactive = True

    def __init__(self, include_neutrinos=True):
        ebin = _B_MEV * C.MeV2erg * C.N_A / _A  # erg/g binding energy
        super().__init__(_SPECIES, aion=_A, zion=_Z, ebin=ebin)
        # sneut5 analog (neutrino.py); reference aprox networks always
        # subtract thermal neutrino losses in the RHS
        self.include_neutrinos = include_neutrinos

    # -- screening ---------------------------------------------------------
    def _screen_weak(self, rho, T9, Y, z1, z2):
        """Screening enhancement: Graboske weak + CP98 ion-sphere strong
        (`network/screening.py`; name kept for the importers that predate
        the strong-screening upgrade)."""
        from castro_tpu.network import screening

        zeta, ye = screening.plasma_moments(Y, _Z)
        return screening.screen_pair(rho, jnp.maximum(T9, _T9_FLOOR),
                                     zeta, ye, z1, z2)

    def rhs(self, rho, T, xn, e=None):
        """Vectorized dX/dt, de/dt (erg/g/s).

        Molar abundances Y_k = X_k / A_k; energy from dY . (N_A * B_k).
        """
        T9 = jnp.maximum(T * 1.0e-9, _T9_FLOOR)
        Y = xn / self.aion.reshape((-1,) + (1,) * (xn.ndim - 1))
        Y = jnp.maximum(Y, 0.0)

        cf = _cf88_rates(T9)
        ydot = [jnp.zeros_like(rho) for _ in range(13)]

        def add(idx_changes, rate):
            for i, w in idx_changes:
                ydot[i] = ydot[i] + w * rate

        # detailed-balance reverse factor for k(a,g)k+1
        def rev_fac(k):
            q = _Q_AG[k - 1]
            afac = (_A[0] * _A[k] / _A[k + 1]) ** 1.5
            return 9.8685e9 * T9 ** 1.5 * afac * jnp.exp(
                jnp.maximum(-q * 11.6045 / T9, -200.0))

        # triple-alpha: 3 He4 <-> C12 (+7.275 MeV).
        # Forward: classic composite fit via the energy-generation form
        # eps = 5.09e11 rho^2 X_He^3 T8^-3 exp(-44.027/T8) erg/g/s
        # (Kippenhahn & Weigert eq. 18.68) => dY_C/dt = eps/(Q N_A).
        # Reverse (c12 photodisintegration): detailed balance of the
        # composite — rev = lam3a(T) * 2.00e20 T9^3 exp(-84.424/T9) * Y_C,
        # the 84.424 = Q * 11.6045; the 2.00e20 T9^3 is
        # (9.8685e9 T9^1.5)^2 (A_a^3/A_C)^1.5 / 3! from the 3-body Saha
        # relation (matches the iso7/aprox13 rg3a expression).
        scr3a = self._screen_weak(rho, T9, Y, 2.0, 2.0) * \
            self._screen_weak(rho, T9, Y, 2.0, 4.0)
        T8 = 10.0 * T9
        q3a_erg_per_mol = 7.275 * C.MeV2erg * C.N_A
        lam3a_T = 5.09e11 * 64.0 / (T8 ** 3) * jnp.exp(-44.027 / T8) * \
            6.0 / q3a_erg_per_mol  # per rho^2 Y_a^3 / 6
        r3a = rho * rho * Y[0] ** 3 / 6.0 * lam3a_T * scr3a
        rg3a = lam3a_T / 6.0 * 2.00e20 * T9 ** 3 * jnp.exp(
            jnp.maximum(-84.424 / T9, -200.0)) * Y[1]
        add([(0, -3.0), (1, 1.0)], r3a - rg3a)

        # heavy-ion fusions
        scr_cc = self._screen_weak(rho, T9, Y, 6.0, 6.0)
        rcc = 0.5 * rho * Y[1] * Y[1] * cf["c12c12"] * scr_cc
        add([(1, -2.0), (3, 1.0), (0, 1.0)], rcc)

        scr_co = self._screen_weak(rho, T9, Y, 6.0, 8.0)
        rco = rho * Y[1] * Y[2] * cf["c12o16"] * scr_co
        add([(1, -1.0), (2, -1.0), (4, 1.0), (0, 1.0)], rco)

        scr_oo = self._screen_weak(rho, T9, Y, 8.0, 8.0)
        roo = 0.5 * rho * Y[2] * Y[2] * cf["o16o16"] * scr_oo
        add([(2, -2.0), (5, 1.0), (0, 1.0)], roo)

        # alpha captures k(a,g)k+1 along the chain + photodisintegration
        lam_ag = [cf["c12ag"], cf["o16ag"], cf["ne20ag"], cf["mg24ag"]] + \
            [_gamow_ag(k, T9) for k in range(5, 12)]
        for k in range(1, 12):
            scr = self._screen_weak(rho, T9, Y, 2.0, _Z[k])
            lam = lam_ag[k - 1] * scr
            # reverse photodisintegration of k+1 by detailed balance on
            # the screened forward rate constant; factored bracket form
            # so the shared lam rounding cancels exactly near NSE (f32)
            net = lam * (rho * Y[0] * Y[k] - rev_fac(k) * Y[k + 1])
            add([(0, -1.0), (k, -1.0), (k + 1, 1.0)], net)

        # (a,p)(p,g) effective links Si28..Ni56 (the aprox13 flow
        # pattern; see module docstring): intermediate in proton-branch
        # steady state, rho*Y_p cancels in frac = lam_pg/(lam_pg+lam_pa).
        # Published WFHZ78 fits for the exothermic directions, exact
        # detailed balance for the endothermic ones (rates_heavy.py),
        # evaluated in the compensated net-flow form
        #   flow = scr_a lam_ap frac (rho Y_a Y_k - K Y_{k+1})
        # (f32-safe near NSE; see rates_heavy.link_flow_terms).
        # Screening: the reverse flow inherits the forward screening
        # factor (screened detailed balance), a deliberate deviation
        # from the reference's forward-only screening — it keeps the
        # NSE fixed point of the screened network exact, which the f32
        # production path relies on.  frac is screening-invariant
        # (scr_p multiplies lam_pg and lam_pa alike and cancels).
        from castro_tpu.network.rates_heavy import link_flow_terms

        for k in range(5, 12):
            _name, zI, aI, q_ap, q_pg = _AP_LINKS[k]
            scr_a = self._screen_weak(rho, T9, Y, 2.0, _Z[k])
            lam_ap, frac, K = link_flow_terms(k, T9, _A, q_ap, q_pg, aI)
            flow = scr_a * lam_ap * frac * \
                (rho * Y[0] * Y[k] - K * Y[k + 1])
            add([(0, -1.0), (k, -1.0), (k + 1, 1.0)], flow)

        ydot_arr = jnp.stack(ydot)
        xdot = ydot_arr * self.aion.reshape((-1,) + (1,) * (xn.ndim - 1))
        # energy generation: sum of binding-energy changes
        bion = (_B_MEV * C.MeV2erg * C.N_A)
        bion = jnp.asarray(bion).reshape((-1,) + (1,) * (xn.ndim - 1))
        edot = jnp.sum(ydot_arr * bion, axis=0)
        if self.include_neutrinos:
            from castro_tpu.network.neutrino import sneut

            ysum = jnp.maximum(jnp.sum(jnp.stack(
                [Y[k] for k in range(13)]), axis=0), 1e-300)
            abar = 1.0 / ysum
            zbar = abar * jnp.sum(jnp.stack(
                [_Z[k] * Y[k] for k in range(13)]), axis=0)
            edot = edot - sneut(rho, T, abar, zbar)
        return xdot, edot
