"""VI-vs-gold-standard cross-validation on AR(1) (the BASELINE acceptance shape)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforssms_tpu.data.generate import generate_ar1
from viforssms_tpu.inference.kalman import kalman_ar1
from viforssms_tpu.inference.mcmc import hmc_sample
from viforssms_tpu.inference.validate import (
    compare_moments,
    path_log_posterior,
    smc_evidence_for_model,
    ssm_log_joint,
)
from viforssms_tpu.models.ar1 import AR1

THETA = (1.0, 0.8, 0.0)


def _data(T=60):
    return generate_ar1(T=T, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0), obs_std=0.7, seed=3)


def test_model_smc_evidence_matches_kalman():
    series = _data(T=60)
    model = AR1(obs_std=0.7)
    res = smc_evidence_for_model(
        model, series.obs, series.obs_bin, 5.0, THETA, n_particles=4096,
        key=jax.random.key(0),
    )
    ll, _, _ = kalman_ar1(series.obs, series.obs_bin, THETA, 5.0, 0.7)
    assert abs(float(res.log_evidence) - float(ll)) < 2.0


@pytest.mark.slow
def test_model_hmc_path_posterior_matches_kalman():
    series = _data(T=40)
    model = AR1(obs_std=0.7)
    logp = path_log_posterior(model, series.obs, series.obs_bin, 5.0,
                              np.asarray(THETA, np.float32), 40)
    init = 5.0 + jax.random.normal(jax.random.key(0), (8, 40))
    samples, _ = hmc_sample(logp, init, jax.random.key(1), num_samples=600,
                            num_warmup=400, step_size=0.1, num_leapfrog=32)
    _, m_s, P_s = kalman_ar1(series.obs, series.obs_bin, THETA, 5.0, 0.7)
    # (samples keeps its chain axis: real Geyer ESS; the Kalman mean row is
    # exact, contributing zero variance to the combined SE)
    cmp = compare_moments(samples, np.asarray(m_s)[None, :])
    # HMC means within a few MC-SE of the exact smoother
    assert float(np.median(cmp.z)) < 3.0, cmp.z


@pytest.mark.slow
def test_vi_theta_posterior_agrees_with_hmc():
    """Learn-theta AR(1): VI theta means vs joint-HMC theta means."""
    from tests.test_train_ar1 import _make_engine

    eng, series = _make_engine(fix_theta=False, T=200, p=32)
    state = eng.init(jax.random.key(0))
    state = eng.pretrain(state, num_steps=60)
    state, _ = eng.fit(state, num_steps=1200)
    vi_theta = eng.sample_theta(state.params, jax.random.key(1), 4000)

    model = AR1(obs_std=0.7)
    logp = ssm_log_joint(model, series.obs, series.obs_bin, 5.0, 200)
    init = jnp.concatenate(
        [jnp.tile(jnp.asarray([[1.0, 0.8, 0.0]]), (4, 1)),
         5.0 + 0.1 * jax.random.normal(jax.random.key(2), (4, 200))], axis=1,
    )
    samples, diag = hmc_sample(logp, init, jax.random.key(3), num_samples=800,
                               num_warmup=600, step_size=0.02, num_leapfrog=48)
    hmc_theta = np.asarray(samples)[:, :, :3].reshape(-1, 3)
    vi_m, hmc_m = vi_theta.mean(0), hmc_theta.mean(0)
    hmc_sd = hmc_theta.std(0)
    # VI is mode-seeking/underdispersed; demand agreement within ~3 posterior SD
    assert np.all(np.abs(vi_m - hmc_m) < 3.0 * hmc_sd + 0.3), (vi_m, hmc_m, hmc_sd)
