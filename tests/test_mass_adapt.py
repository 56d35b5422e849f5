"""Diagonal mass-matrix adaptation: badly-scaled Gaussian targets.

A unit metric on a target with marginal variances spanning 4 orders of
magnitude forces tiny step sizes; the adapted diagonal metric must (a) learn
the marginal variances and (b) recover the moments of the hard target.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforssms_tpu.inference.mcmc import hmc_sample, nuts_sample
from viforssms_tpu.inference.mcmc.hmc import (
    welford_init,
    welford_update_batch,
    welford_variance,
)


def test_welford_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 8, 3)) * np.array([0.1, 1.0, 7.0])
    w = welford_init(3)
    for batch in x:
        w = welford_update_batch(w, jnp.asarray(batch))
    var = np.asarray(welford_variance(w, regularize=False))
    np.testing.assert_allclose(var, x.reshape(-1, 3).var(0, ddof=1), rtol=1e-4)


def _hard_target():
    # diag-covariance Gaussian with variances 100, 1, 0.01
    sd = jnp.array([10.0, 1.0, 0.1])
    mu = jnp.array([2.0, -1.0, 0.5])

    def logp(q):
        return -0.5 * jnp.sum(((q - mu) / sd) ** 2)

    return logp, np.asarray(mu), np.asarray(sd)


@pytest.mark.parametrize("sampler,kwargs", [
    (hmc_sample, {"num_leapfrog": 32}),
    (nuts_sample, {"max_depth": 8}),
])
def test_mass_adaptation_learns_scales_and_moments(sampler, kwargs):
    logp, mu, sd = _hard_target()
    init = jax.random.normal(jax.random.key(0), (8, 3))
    samples, diag = sampler(
        logp, init, jax.random.key(1), num_samples=500, num_warmup=600,
        step_size=0.1, adapt_mass=True, **kwargs,
    )
    inv_mass = np.asarray(diag["inv_mass"])
    # adapted inverse mass ~ marginal variances (within a factor of 3)
    ratio = inv_mass / sd**2
    assert np.all(ratio > 1 / 3) and np.all(ratio < 3), ratio
    draws = np.asarray(samples).reshape(-1, 3)
    # per-coordinate mean error in posterior-sd units (array atol breaks
    # assert_allclose's eager :g header formatting — use a scalar bound)
    np.testing.assert_allclose((draws.mean(0) - mu) / sd, 0.0, atol=0.25)
    np.testing.assert_allclose(draws.std(0) / sd, 1.0, rtol=0.3)
    assert float(np.mean(np.asarray(diag["accept"]))) > 0.5


def test_dense_mass_handles_correlated_target():
    """rho=0.95 bivariate Gaussian: the dense metric must learn the
    covariance (off-diagonal included) and recover the moments."""
    cov = np.array([[1.0, 0.95], [0.95, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.array([1.0, -2.0])

    def logp(q):
        d = q - mu
        return -0.5 * d @ prec @ d

    init = jax.random.normal(jax.random.key(0), (8, 2))
    samples, diag = hmc_sample(
        logp, init, jax.random.key(1), num_samples=600, num_warmup=600,
        step_size=0.2, num_leapfrog=16, dense_mass=True,
    )
    chol = np.asarray(diag["inv_mass"])
    assert chol.shape == (2, 2)
    sigma_hat = chol @ chol.T  # adapted inverse metric ~ posterior covariance
    np.testing.assert_allclose(sigma_hat, cov, atol=0.35)
    assert sigma_hat[0, 1] > 0.5  # learned the strong positive correlation
    draws = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.35)
    assert float(np.mean(np.asarray(diag["accept"]))) > 0.6


def test_dense_mass_iterative_nuts_correlated_target():
    """The iterative NUTS with a dense metric on the rho=0.95 Gaussian: the
    velocity-based U-turn test runs through Σp and the sampler must learn the
    full covariance and recover the moments (parity with hmc dense_mass)."""
    cov = np.array([[1.0, 0.95], [0.95, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.array([1.0, -2.0])

    def logp(q):
        d = q - mu
        return -0.5 * d @ prec @ d

    init = jax.random.normal(jax.random.key(0), (8, 2))
    samples, diag = nuts_sample(
        logp, init, jax.random.key(1), num_samples=600, num_warmup=600,
        step_size=0.2, max_depth=8, dense_mass=True,
    )
    chol = np.asarray(diag["inv_mass"])
    assert chol.shape == (2, 2)
    sigma_hat = chol @ chol.T
    np.testing.assert_allclose(sigma_hat, cov, atol=0.35)
    assert sigma_hat[0, 1] > 0.5
    draws = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.35)
    assert float(np.mean(np.asarray(diag["accept"]))) > 0.6


def test_welford_covariance_matches_numpy():
    from viforssms_tpu.inference.mcmc.hmc import (
        welford_cov_init,
        welford_cov_update_batch,
        welford_covariance,
    )

    rng = np.random.default_rng(5)
    a = rng.normal(size=(300, 3))
    x = (a @ np.array([[1.0, 0.5, 0.0], [0.0, 1.0, -0.3], [0.0, 0.0, 2.0]])
         ).reshape(30, 10, 3)
    w = welford_cov_init(3)
    for batch in x:
        w = welford_cov_update_batch(w, jnp.asarray(batch))
    got = np.asarray(welford_covariance(w, regularize=False))
    want = np.cov(x.reshape(-1, 3).T, ddof=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_unit_metric_unchanged_without_flag():
    """adapt_mass=False keeps the previous single-phase behavior."""
    logp, mu, sd = _hard_target()
    init = jax.random.normal(jax.random.key(0), (4, 3))
    _, diag = hmc_sample(logp, init, jax.random.key(1), num_samples=10,
                         num_warmup=20, step_size=0.1, num_leapfrog=8)
    np.testing.assert_array_equal(np.asarray(diag["inv_mass"]), np.ones(3))
