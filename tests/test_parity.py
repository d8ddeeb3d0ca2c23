"""Parity harness CI subset: deviation-set vs reference-faithful closed
loops (fp64) on a recorded X1 path.

The full 8-path x 2-formulation table is produced by
`python -m pigeon_tpu.parity` (see README "Parity vs the reference
algorithm"); these tests pin the representative cases so regressions in
any deviation (tire inverse, linearization, command clamp) surface as
control-sequence drift.  Reference loop mirrored:
`src/model_predictive_control.jl:80-100`.
"""

import pytest

from pigeon_tpu import parity

STEPS = 80


@pytest.fixture(scope="module")
def decoupled_result():
    return parity.compare("skidpadoval", "decoupled", n_steps=STEPS)


@pytest.fixture(scope="module")
def coupled_stable_result():
    # lin_substeps=4: the reference algorithm with its RK4 linearization
    # made numerically stable (the single-step variant destabilizes the
    # long-horizon models; see test_coupled_literal_rk4 below)
    return parity.compare("skidpadoval", "coupled", n_steps=STEPS,
                          lin_substeps=4)


def test_decoupled_controls_match_reference_algorithm(decoupled_result):
    """Decoupled formulation: the only active deviation is the corrected
    inverse-tire factor in trim seeding -> control sequences must be
    essentially identical."""
    r = decoupled_result
    assert r.prefix_steps == STEPS
    assert r.conv_frac_faithful == 1.0 and r.conv_frac_deviation == 1.0
    assert r.max_d_delta_rad < 1e-4          # < 0.1 mrad steering
    assert r.max_d_Fx_N < 0.1                # feedforward Fx identical
    assert r.max_e_faithful_m < 0.5 and r.max_e_deviation_m < 0.5


def test_coupled_controls_match_stable_reference_algorithm(
        coupled_stable_result):
    """Coupled formulation vs the (stabilized) reference algorithm:
    steering within 5 mrad, Fx within 150 N over the full closed loop."""
    r = coupled_stable_result
    assert r.prefix_steps == STEPS
    assert r.conv_frac_faithful == 1.0 and r.conv_frac_deviation == 1.0
    assert r.max_d_delta_rad < 5e-3          # < 5 mrad (delta_max = 314)
    assert r.max_d_Fx_N < 150.0              # < 3% of Fx_max
    assert r.max_e_faithful_m < 0.5 and r.max_e_deviation_m < 0.5


def test_second_path_curvy_decoupled():
    """Second CI path (curvy: |kappa| spikes ~1.0 1/m, the stress
    input): literal reference algorithm, decoupled — full-prefix
    agreement like the committed PARITY.json table."""
    r = parity.compare("curvy", "decoupled", n_steps=STEPS)
    assert r.prefix_steps == STEPS
    assert r.conv_frac_faithful == 1.0 and r.conv_frac_deviation == 1.0
    assert r.max_d_delta_rad < 1e-4
    assert r.max_d_Fx_N < 0.1


def test_coupled_literal_rk4_breaks_its_own_solver():
    """The literal reference linearization (ONE RK4 step over dt_long=0.2,
    src/coupled_lat_long.jl:262) amplifies the stiff lateral tire modes
    (|R(lambda h)| >> 1), and its QPs stop converging during transients --
    the documented justification for the build's expm deviation.  The
    deviation set must stay fully converged on the same scenario, and the
    two must agree while the faithful solver still converges."""
    r = parity.compare("skidpadoval", "coupled", n_steps=STEPS,
                       lin_substeps=1)
    assert r.conv_frac_deviation == 1.0
    assert r.conv_frac_faithful < 1.0        # the reference pathology
    assert r.prefix_steps >= 3
    assert r.max_d_delta_rad < 0.02          # still agrees pre-divergence
    assert r.deviation_finite
