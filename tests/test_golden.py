"""Golden-field regression (SURVEY.md §4.3): the reference solver's exact
configuration (50x8x51 grid, every constant of LBM.h:28-125) run for 60
steps in f64 must keep reproducing the recorded steady diagnostics.

The reference publishes no fields, so these goldens are this framework's
own f64 run pinned at the commit that passed the full physics test pyramid
(Poiseuille / Debye-Huckel / thermal-conduction analytics + the Pallas and
sharding equality tests).  They guard every part of the coupled pipeline at
once: TRT collide, wall BCs, streaming, PB init, spectral Poisson, E-field,
Boussinesq coupling.
"""
import jax.numpy as jnp
import numpy as np

from ekpnp import preset
from ekpnp.diagnostics import ionic_current, umax
from ekpnp.init import initialize
from ekpnp.ops.collide import compute_macro
from ekpnp.ops.poisson import efield
from ekpnp.step import multi_step

GOLDEN = {
    "umax": 5.187470428001874e-06,
    "current": 3.876682369403333e-18,
    "rho_mean": 1000.0000000000034,
    "charge_sum": 222.36470208917254,
    "chargen_sum": 187.76456959284795,
    "temp_mean": 0.4999999904026738,
    "phi_min": -0.0052574,
    "phi_max": -0.0006892896051530279,
    "uz_abs_sum": 0.02935283751694766,
}


def test_reference_config_golden_fields():
    cfg = preset("reference")
    state, _ = initialize(cfg)
    state = multi_step(cfg, state, 60)
    macro, _ = compute_macro(cfg, state)
    E = efield(cfg, state.phi)
    got = {
        "umax": float(umax(macro.u)),
        "current": float(ionic_current(cfg, macro.charge, macro.chargen, E[2])),
        "rho_mean": float(jnp.mean(macro.rho)),
        "charge_sum": float(jnp.sum(macro.charge)),
        "chargen_sum": float(jnp.sum(macro.chargen)),
        "temp_mean": float(jnp.mean(macro.temp)),
        "phi_min": float(jnp.min(state.phi)),
        "phi_max": float(jnp.max(state.phi)),
        "uz_abs_sum": float(jnp.sum(jnp.abs(macro.u[2]))),
    }
    for key, want in GOLDEN.items():
        # f64 end-to-end: anything beyond accumulated roundoff across 60
        # coupled steps (~1e-10 relative) is a physics regression
        np.testing.assert_allclose(got[key], want, rtol=1e-9, err_msg=key)
