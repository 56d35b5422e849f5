"""Iterative NUTS vs the statically-unrolled NUTS and exact Gaussian moments."""

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.inference.mcmc.nuts import nuts_sample
from viforssms_tpu.inference.mcmc.nuts_iterative import nuts_sample_iterative


def _target():
    cov = np.array([[2.0, 0.8, 0.1], [0.8, 1.0, -0.2], [0.1, -0.2, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -0.5, 0.3])

    def logp(q):
        d = q - mu
        return -0.5 * d @ prec @ d

    return logp, np.asarray(mu), cov


def test_iterative_nuts_recovers_gaussian_moments():
    logp, mu, cov = _target()
    init = jax.random.normal(jax.random.key(0), (8, 3))
    samples, diag = nuts_sample_iterative(
        logp, init, jax.random.key(1), num_samples=700, num_warmup=400,
        step_size=0.3, max_depth=8,
    )
    draws = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.12)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.4)


def test_iterative_and_static_nuts_agree():
    logp, mu, cov = _target()
    init = jax.random.normal(jax.random.key(2), (8, 3))
    s_it, _ = nuts_sample_iterative(
        logp, init, jax.random.key(3), num_samples=600, num_warmup=400,
        step_size=0.3, max_depth=6,
    )
    s_st, _ = nuts_sample(
        logp, init, jax.random.key(4), num_samples=600, num_warmup=400,
        step_size=0.3, max_depth=6,
    )
    a = np.asarray(s_it).reshape(-1, 3)
    b = np.asarray(s_st).reshape(-1, 3)
    np.testing.assert_allclose(a.mean(0), b.mean(0), atol=0.15)
    np.testing.assert_allclose(a.std(0), b.std(0), atol=0.2)
