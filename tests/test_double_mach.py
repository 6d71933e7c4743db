"""Double Mach reflection (BASELINE config A2; reference
`Exec/hydro_tests/double_mach_reflection`): time-dependent inflow BCs."""

import numpy as np

from castro_tpu.problems import double_mach


def test_dmr_shock_tracks_analytic_and_stem_forms():
    sim = double_mach.build(n=(128, 32))
    sim.init_data()
    sim.run(stop_time=0.05, verbose=False)
    L = sim.layout
    ui = np.asarray(sim.interior())
    rho = ui[L.URHO]
    assert np.all(np.isfinite(rho))
    # Mach stem compression well above the simple post-shock density 8
    assert rho.max() > 12.0, rho.max()
    # the incident shock on the top row follows the analytic trajectory
    x = np.asarray(sim.geom.cell_centers_1d(0, 0))
    top = rho[:, -1]
    xs_num = x[np.argmax(np.abs(np.diff(top)))]
    xs_ana = 1 / 6 + 1.0 / np.tan(np.pi / 3) + (10 / np.sin(np.pi / 3)) * sim.t
    assert abs(xs_num - xs_ana) < 4 * (4.0 / 128), (xs_num, xs_ana)
    # pre-shock region undisturbed
    assert np.isclose(rho[-1, 0], 1.4, rtol=1e-6)
