"""NaN-debugging hooks (SURVEY.md section 5): phase-boundary finite checks
must localize a NaN injected into the optimization loop to its phase."""
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.utils import debug


def test_check_finite_names_phase_and_array():
    debug.check_finite("adjoint", a=jnp.ones(4))  # clean passes
    bad = jnp.asarray([1.0, np.nan, 2.0])
    with pytest.raises(debug.NonFiniteError) as ei:
        debug.check_finite("jprime", Jp=bad)
    assert ei.value.phase == "jprime"
    assert ei.value.name == "Jp"
    with pytest.raises(debug.NonFiniteError) as ei:
        debug.check_finite("ns_solve", s=jnp.asarray([jnp.inf]))
    assert ei.value.phase == "ns_solve"


@pytest.mark.slow
def test_nan_injection_localized_to_jprime():
    # inject a NaN into the shape gradient: with debug_nans on, the outer
    # loop must raise at the 'jprime' phase boundary instead of surfacing a
    # silent failed step
    import dataclasses

    from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
    from admm_optim_tpu.optim import admm

    cfg = ProblemConfig(
        dim=2,
        num_refs=0,
        visc=0.1,
        debug_nans=True,
        admm=admm.ADMMConfig(admm_steps=5, ns_max_its=3, tau=2.0, lin_max_iters=60),
    )
    prob = ObstacleShapeOpt(cfg)
    orig = prob._jprime
    prob._jprime = lambda X, s, lam: orig(X, s, lam) * jnp.nan
    with pytest.raises(debug.NonFiniteError) as ei:
        prob.run(num_steps=1)
    assert ei.value.phase == "jprime"
