"""Multigrid solver verification: manufactured solutions for Poisson and
ABec problems (replaces the role of AMReX MLMG / Hypre regression checks)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.solvers import multigrid as mg


def test_poisson_periodic_2d():
    n = 64
    dx = (1.0 / n, 1.0 / n)
    x = (np.arange(n) + 0.5) / n
    X, Y = np.meshgrid(x, x, indexing="ij")
    k = 2 * np.pi
    u_exact = np.sin(k * X) * np.sin(2 * k * Y)
    rhs = -(k**2 + (2 * k) ** 2) * u_exact

    u, res = mg.poisson(jnp.asarray(rhs), dx, bc_lo=("periodic",) * 2,
                        bc_hi=("periodic",) * 2, n_vcycles=12)
    u = np.array(u)
    u -= u.mean()
    err = np.abs(u - (u_exact - u_exact.mean())).max()
    assert err < 4e-3, err  # discretization error at n=64
    assert float(res) < 1e-8 * np.abs(rhs).max()


def test_poisson_dirichlet_3d():
    n = 32
    dx = (1.0 / n,) * 3
    x = (np.arange(n) + 0.5) / n
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    k = np.pi
    u_exact = np.sin(k * X) * np.sin(k * Y) * np.sin(k * Z)
    rhs = -3 * k**2 * u_exact

    u, res = mg.poisson(jnp.asarray(rhs), dx,
                        bc_lo=("dirichlet",) * 3, bc_hi=("dirichlet",) * 3,
                        n_vcycles=12)
    err = np.abs(np.asarray(u) - u_exact).max()
    assert err < 5e-3, err
    assert float(res) < 1e-8 * np.abs(rhs).max()


def test_poisson_inhomogeneous_dirichlet_1d():
    """u'' = 0 with u(0)=1, u(1)=3 -> u = 1 + 2x."""
    n = 64
    dx = (1.0 / n,)
    rhs = np.zeros(n)
    u, res = mg.poisson(jnp.asarray(rhs), dx,
                        bc_lo=("dirichlet",), bc_hi=("dirichlet",),
                        bc_vals_lo=[1.0], bc_vals_hi=[3.0], n_vcycles=12)
    x = (np.arange(n) + 0.5) / n
    assert np.abs(np.asarray(u) - (1 + 2 * x)).max() < 1e-8


def test_abec_variable_coeff_2d():
    """alpha*a*u - beta*div(b grad u) = rhs with manufactured solution."""
    n = 64
    dx = (1.0 / n, 1.0 / n)
    x = (np.arange(n) + 0.5) / n
    X, Y = np.meshgrid(x, x, indexing="ij")
    k = 2 * np.pi
    u_exact = np.cos(k * X) * np.cos(k * Y)
    a = 1.0 + 0.5 * np.sin(k * X) * np.sin(k * Y)
    # b = 1 (face arrays of ones) so analytic rhs is simple
    bx = np.ones((n + 1, n))
    by = np.ones((n, n + 1))
    alpha, beta = 2.0, 0.5
    rhs = alpha * a * u_exact + beta * 2 * k**2 * u_exact

    u, res = mg.solve(jnp.asarray(rhs), dx, acoef=jnp.asarray(a),
                      bcoefs=[jnp.asarray(bx), jnp.asarray(by)],
                      alpha=alpha, beta=beta,
                      bc_lo=("periodic",) * 2, bc_hi=("periodic",) * 2,
                      n_vcycles=12)
    err = np.abs(np.asarray(u) - u_exact).max()
    assert err < 5e-3, err


def test_mg_convergence_order():
    """Discretization error is 2nd order."""
    errs = []
    for n in (32, 64):
        dx = (1.0 / n,) * 2
        x = (np.arange(n) + 0.5) / n
        X, Y = np.meshgrid(x, x, indexing="ij")
        k = 2 * np.pi
        u_exact = np.sin(k * X) * np.sin(k * Y)
        rhs = -2 * k**2 * u_exact
        u, _ = mg.poisson(jnp.asarray(rhs), dx, bc_lo=("periodic",) * 2,
                          bc_hi=("periodic",) * 2, n_vcycles=14)
        u = np.array(u)
        errs.append(np.abs((u - u.mean()) - (u_exact - u_exact.mean())).max())
    order = np.log2(errs[0] / errs[1])
    assert order > 1.8, (errs, order)
