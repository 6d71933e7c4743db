"""Unit-test problem ports (reference Exec/unit_tests)."""

def test_model_burner():
    """Exec/unit_tests/model_burner: burn every zone of a 1D model for a
    fixed dt; hot dense He zones release energy, cold zones don't, and
    no zone fails."""
    import numpy as np
    import jax.numpy as jnp
    from castro_tpu.eos import make_eos
    from castro_tpu.network import make_network
    from castro_tpu.config import Params
    from castro_tpu.problems.unit_tests import model_burner
    from castro_tpu.utils.model_parser import InitialModel

    p = Params().with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="triple_alpha_plus_cago")
    eos = make_eos(p)
    net = make_network(p)

    npts = 6
    r = np.linspace(0.0, 1.0e8, npts)
    rho = np.array([1e6, 5e5, 2e5, 1e5, 1e4, 1e3])
    T = np.array([3e8, 2.5e8, 2e8, 1.5e8, 5e7, 1e7])
    data = {"density": rho, "temperature": T}
    for s in net.spec_names:
        data[s.lower()] = np.full(npts, 1e-10)
    data["he4"] = np.full(npts, 1.0 - (net.nspec - 1) * 1e-10)
    model = InitialModel(r, data)

    xn_new, enuc, fail = model_burner(model, 0.1, net, eos)
    assert not bool(jnp.any(fail))
    enuc = np.asarray(enuc)
    assert enuc[0] > 0.0                 # hottest/densest zone burns
    assert enuc[0] > 1e3 * max(enuc[-1], 1e-30)  # cold zone ~inert
    assert np.asarray(xn_new)[0, 0] < data["he4"][0]  # He consumed
