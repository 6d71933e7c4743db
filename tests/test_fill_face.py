"""General face-centered BC fill (reference filfc.f90 +
Castro_setup's face-variable BC records)."""

import numpy as np

import jax.numpy as jnp

from castro_tpu.ops.fill import fill_face


def _grown(n, ng, dim, df):
    """Face field with distinct interior values."""
    shape = tuple(n + 2 * ng for _ in range(dim))
    b = np.zeros(shape)
    sl = tuple(slice(ng, ng + n) for _ in range(dim))
    rng = np.random.default_rng(0)
    b[sl] = rng.normal(size=(n,) * dim)
    return jnp.asarray(b)


def test_face_fill_periodic_wraps_faces():
    n, ng = 8, 2
    b = _grown(n, ng, 2, 0)
    out = np.asarray(fill_face(b, 0, 2, ng, (0, 0), (0, 0)))
    # normal axis: face j == face j+n
    assert np.allclose(out[ng - 1, ng:ng + n], out[ng - 1 + n, ng:ng + n])
    # transverse axis wraps like cells
    assert np.allclose(out[ng:ng + n, ng - 1], out[ng:ng + n, ng + n - 1])


def test_face_fill_wall_odd_mirror_normal():
    n, ng = 8, 2
    b = _grown(n, ng, 2, 0)
    # symmetry walls along the normal axis
    out = np.asarray(fill_face(b, 0, 2, ng, (3, 0), (3, 0)))
    # ghost face ng-1 mirrors face ng+1 with odd parity about face ng
    assert np.allclose(out[ng - 1, ng:ng + n], -out[ng + 1, ng:ng + n])
    assert np.allclose(out[ng - 2, ng:ng + n], -out[ng + 2, ng:ng + n])
    # hi wall face pinned to zero, ghosts mirror beyond it
    assert np.allclose(out[ng + n], 0.0)
    assert np.allclose(out[ng + n + 1, ng:ng + n],
                       -out[ng + n - 1, ng:ng + n])


def test_face_fill_transverse_even_vs_noslip_odd():
    n, ng = 8, 2
    b = _grown(n, ng, 2, 0)
    # slipwall transverse: even mirror
    out = np.asarray(fill_face(b, 0, 2, ng, (0, 4), (0, 4)))
    assert np.allclose(out[ng:ng + n, ng - 1], out[ng:ng + n, ng])
    # noslip transverse: odd
    out2 = np.asarray(fill_face(b, 0, 2, ng, (0, 5), (0, 5)))
    assert np.allclose(out2[ng:ng + n, ng - 1], -out2[ng:ng + n, ng])


def test_face_fill_outflow_clamps():
    n, ng = 8, 2
    b = _grown(n, ng, 1, 0)
    out = np.asarray(fill_face(b, 0, 1, ng, (2,), (2,)))
    assert np.allclose(out[:ng], out[ng])
    assert np.allclose(out[ng + n:], out[ng + n - 1])
