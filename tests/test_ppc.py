"""Posterior-predictive checks: observation replay parity + discrimination."""

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.data.generate import generate_ar1
from viforssms_tpu.inference.ppc import posterior_predictive_check
from viforssms_tpu.models.ar1 import AR1
from viforssms_tpu.models.lotka_volterra import (
    LotkaVolterraLearnObsScale,
    LotkaVolterraLearnTheta,
)

THETA = (1.0, 0.8, 0.0)


def test_observation_sample_matches_density_moments():
    """observation_sample must realize the same distribution its
    observation_log_prob scores: check conditional moments."""
    model = AR1(obs_std=0.7)
    x = jnp.linspace(-2.0, 3.0, 50)[None, :].repeat(4000, 0)
    y = model.observation_sample(jax.random.key(0), x, None)
    np.testing.assert_allclose(np.asarray(y.mean(0)), np.asarray(x[0]), atol=0.06)
    np.testing.assert_allclose(float(y.std(0).mean()), 0.7, atol=0.03)


def test_lv_observation_sample_inverts_its_density():
    """LV learn-theta samples y = f(u), u ~ N(x, c*x): pulling samples back
    through the chain must recover those conditional moments."""
    from viforssms_tpu.models.lotka_volterra import _SDE_CHAIN

    model = LotkaVolterraLearnTheta()
    x = jnp.full((6000, 2, 9), 80.0)
    th = jnp.full((6000, 3), 0.3)
    y = model.observation_sample(jax.random.key(1), x, th)
    u = _SDE_CHAIN.inverse(y)
    np.testing.assert_allclose(float(u.mean()), 80.0, rtol=0.01)
    np.testing.assert_allclose(float(u.std()), 0.2 * 80.0, rtol=0.05)
    # learned-scale subclass reads the factor from theta's last column
    model4 = LotkaVolterraLearnObsScale()
    th4 = jnp.concatenate([th, jnp.full((6000, 1), 0.05)], axis=1)
    y4 = model4.observation_sample(jax.random.key(2), x, th4)
    u4 = _SDE_CHAIN.inverse(y4)
    np.testing.assert_allclose(float(u4.std()), 0.05 * 80.0, rtol=0.05)


def _ar1_ppc(model_obs_std, seed=0):
    series = generate_ar1(T=400, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0),
                          obs_std=0.7, seed=3)
    model = AR1(obs_std=model_obs_std)
    # "posterior" draws = the true latent path (the best any posterior can
    # do); the check then isolates the OBSERVATION model's fit
    n = 400
    paths = jnp.asarray(series.latent[1:])[None, :].repeat(n, 0)
    theta = jnp.asarray(THETA)[None, :].repeat(n, 0)
    return posterior_predictive_check(
        model, paths, theta, series.obs, series.obs_bin, jax.random.key(seed))


def test_ppc_well_specified_is_calibrated():
    res = _ar1_ppc(model_obs_std=0.7)
    for k, p in res.p_values.items():
        assert 0.01 < p < 0.99, (k, p, res.observed[k])
    assert res.extreme() == {}


def test_ppc_flags_misspecified_observation_noise():
    """Model claims obs_std 0.2 while the data used 0.7: the spread statistic
    must land in the tail (the replicated y are far too concentrated)."""
    res = _ar1_ppc(model_obs_std=0.2)
    assert res.p_values["std"] < 0.01, res.p_values
    assert "std" in res.extreme()


def test_engine_ppc_end_to_end():
    """The engine-level wrapper: trained AR(1) VI posterior -> replay -> all
    four default statistics produce p-values; well-trained + well-specified
    means none should be extreme at 0.1%."""
    from tests.test_train_ar1 import _make_engine

    eng, series = _make_engine(fix_theta=True, T=200)
    state = eng.init(jax.random.key(0))
    state = eng.pretrain(state, num_steps=60)
    state, _ = eng.fit(state, num_steps=500)
    from viforssms_tpu.inference.ppc import engine_ppc

    res = engine_ppc(eng, state.params, jax.random.key(1),
                     series.obs, series.obs_bin)
    assert set(res.p_values) == {"mean", "std", "lag1", "max"}
    for k, p in res.p_values.items():
        assert 0.001 < p < 0.999, (k, p, res.observed[k])
