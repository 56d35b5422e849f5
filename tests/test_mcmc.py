"""HMC/NUTS validation: exact Gaussian targets and the AR(1) Kalman oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforssms_tpu.inference.kalman import kalman_ar1
from viforssms_tpu.inference.mcmc import hmc_sample, nuts_sample


def _gaussian_target():
    cov = np.array([[2.0, 0.8], [0.8, 1.0]])
    prec = np.linalg.inv(cov)
    mu = np.array([1.0, -0.5])

    def logp(q):
        d = q - mu
        return -0.5 * d @ jnp.asarray(prec) @ d

    return logp, mu, cov


@pytest.mark.parametrize("sampler", [hmc_sample, nuts_sample])
def test_sampler_recovers_gaussian_moments(sampler):
    logp, mu, cov = _gaussian_target()
    init = jax.random.normal(jax.random.key(0), (8, 2))
    samples, diag = sampler(
        logp, init, jax.random.key(1), num_samples=600, num_warmup=400, step_size=0.3
    )
    draws = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.12)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.35)
    assert float(jnp.mean(diag["accept"])) > 0.3


@pytest.mark.slow
def test_hmc_ar1_path_posterior_matches_kalman():
    """Joint HMC over the latent path (theta fixed) must match the smoother."""
    from viforssms_tpu.data.generate import generate_ar1

    T = 30
    theta = (1.0, 0.8, 0.0)
    series = generate_ar1(T=T, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0), obs_std=0.7, seed=3)
    obs = jnp.asarray(series.obs)
    obs_bin = jnp.asarray(series.obs_bin)

    def logp(x):
        head = jnp.concatenate([jnp.array([5.0]), x[:-1]])
        trans = -0.5 * jnp.sum((x - (theta[1] * head + theta[0])) ** 2) / jnp.exp(theta[2]) ** 2
        obs_lp = -0.5 * jnp.sum(obs_bin * (obs - x) ** 2) / 0.7**2
        return trans + obs_lp

    init = 5.0 + jax.random.normal(jax.random.key(0), (8, T))
    samples, _ = hmc_sample(
        logp, init, jax.random.key(1), num_samples=800, num_warmup=500,
        step_size=0.1, num_leapfrog=32,
    )
    draws = np.asarray(samples).reshape(-1, T)
    ll, m_s, P_s = kalman_ar1(series.obs, series.obs_bin, theta, 5.0, 0.7)
    err = np.abs(draws.mean(0) - np.asarray(m_s))
    # within 4 posterior std / sqrt(ESS-ish) tolerance
    assert float(np.max(err / np.sqrt(np.asarray(P_s)))) < 0.5, err
