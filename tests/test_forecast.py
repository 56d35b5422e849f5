"""Posterior-predictive forecasting: closed-form moments + end-to-end shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.inference.forecast import forecast, posterior_predictive
from viforssms_tpu.models.ar1 import AR1
from viforssms_tpu.models.fitzhugh_nagumo import FitzHughNagumo
from viforssms_tpu.models.lotka_volterra import LotkaVolterra
from viforssms_tpu.models.stochastic_volatility import StochasticVolatility


def test_ar1_forecast_matches_closed_form_moments():
    """k-step AR(1) forecast: mean a^k x + b(1-a^k)/(1-a), var s^2(1-a^2k)/(1-a^2)."""
    a, b, log_s = 0.8, 1.0, np.log(0.5)
    p, horizon = 20_000, 10
    theta = jnp.tile(jnp.asarray([b, a, log_s]), (p, 1))
    x0 = jnp.full((p,), 3.0)
    xs = np.asarray(forecast(AR1(), jax.random.key(0), x0, theta, horizon))
    assert xs.shape == (p, horizon)
    s2 = np.exp(log_s) ** 2
    for k in (1, 5, 10):
        mean_k = a**k * 3.0 + b * (1 - a**k) / (1 - a)
        var_k = s2 * (1 - a ** (2 * k)) / (1 - a**2)
        got = xs[:, k - 1]
        se = np.sqrt(var_k / p)
        assert abs(got.mean() - mean_k) < 5 * se, (k, got.mean(), mean_k)
        np.testing.assert_allclose(got.var(), var_k, rtol=0.08)


def test_bivariate_forecast_shapes_and_domains():
    p, horizon = 64, 20
    key = jax.random.key(1)
    lv_theta = jnp.tile(jnp.log(jnp.asarray([0.5, 0.0025, 0.3])), (p, 1))
    lv_x = jnp.tile(jnp.asarray([100.0, 100.0]), (p, 1))
    xs = np.asarray(forecast(LotkaVolterra(dt=0.1), key, lv_x, lv_theta, horizon))
    assert xs.shape == (p, 2, horizon)
    assert np.all(xs > 0)  # LV forecasts stay in the positive domain

    fhn = FitzHughNagumo(dt=0.1)
    fhn_theta = jnp.tile(jnp.asarray(fhn.pretrain_theta_anchor), (p, 1))
    xs = np.asarray(forecast(fhn, key, jnp.zeros((p, 2)), fhn_theta, horizon))
    assert xs.shape == (p, 2, horizon) and np.all(np.isfinite(xs))

    sv = StochasticVolatility(dt=1.0)
    sv_theta = jnp.tile(jnp.asarray(sv.pretrain_theta_anchor), (p, 1))
    sv_x = jnp.tile(jnp.asarray([0.1, -7.0]), (p, 1))
    xs = np.asarray(forecast(sv, key, sv_x, sv_theta, horizon))
    assert xs.shape == (p, 2, horizon) and np.all(np.isfinite(xs))


def test_posterior_predictive_end_to_end():
    from __graft_entry__ import _lv_engine

    eng = _lv_engine(target=40, batch_dims=10, p=8, kernel_len=4, no_flows=2,
                     net=(8, 8, 8), feat_window=3, aligned=True)
    state = eng.init(jax.random.key(0))
    state, _ = eng.train_many(state, 10)
    paths, theta = posterior_predictive(eng, state.params, jax.random.key(2),
                                        horizon=15)
    assert paths.shape == (8, 2, 15)
    assert theta.shape[0] == 8
    assert np.all(np.isfinite(np.asarray(paths)))
    assert np.all(np.asarray(paths) > 0)
