"""Unit tests for the distribution/bijector layer against closed forms and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from viforssms_tpu.distributions import (
    Affine,
    Chain,
    Exp,
    MultivariateNormalDiag,
    Normal,
    Softplus,
    TransformedDistribution,
    bivariate_tril_logpdf,
    diag_normal_logpdf,
    normal_logpdf,
)
from viforssms_tpu.distributions.bijectors import softplus_path_transform, sum_event


def test_normal_logpdf_matches_scipy():
    x = np.linspace(-5, 7, 31)
    got = normal_logpdf(jnp.asarray(x), 1.3, 2.1)
    want = stats.norm.logpdf(x, 1.3, 2.1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_normal_sample_moments():
    d = Normal(loc=2.0, scale=3.0)
    s = d.sample(jax.random.key(0), (200_000,))
    assert abs(float(jnp.mean(s)) - 2.0) < 0.05
    assert abs(float(jnp.std(s)) - 3.0) < 0.05


def test_mvn_diag_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 3))
    loc = np.array([0.5, -1.0, 2.0])
    scale = np.array([1.0, 0.3, 2.5])
    got = MultivariateNormalDiag(loc, scale).log_prob(jnp.asarray(x))
    want = stats.multivariate_normal.logpdf(x, loc, np.diag(scale**2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bivariate_tril_matches_scipy():
    rng = np.random.default_rng(1)
    a, b, c = 1.5, -0.7, 0.9
    L = np.array([[a, 0.0], [b, c]])
    cov = L @ L.T
    mu = np.array([0.3, -0.2])
    x = rng.normal(size=(50, 2))
    got = bivariate_tril_logpdf(
        jnp.asarray(x[:, 0]), jnp.asarray(x[:, 1]), mu[0], mu[1], a, b, c
    )
    want = stats.multivariate_normal.logpdf(x, mu, cov)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_diag_normal_logpdf():
    got = diag_normal_logpdf(1.0, 2.0, 0.0, 0.0, 1.0, 2.0)
    want = stats.norm.logpdf(1.0, 0, 1) + stats.norm.logpdf(2.0, 0, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("bij", [Softplus(), Exp(), Affine(shift=2.0, scale=-1.5)])
def test_bijector_inverse_roundtrip(bij):
    x = jnp.linspace(-3, 3, 41)
    y = bij.forward(x)
    np.testing.assert_allclose(bij.inverse(y), x, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize(
    "bij",
    [
        Softplus(),
        Exp(),
        Affine(shift=2.0, scale=3.0),
        softplus_path_transform(1.0),
        Chain((Affine(shift=1.0), Softplus())),
    ],
)
def test_bijector_log_det_vs_autodiff(bij):
    xs = jnp.linspace(-2.5, 2.5, 21)
    fldj_auto = jax.vmap(lambda x: jnp.log(jnp.abs(jax.grad(lambda t: bij.forward(t))(x))))(xs)
    np.testing.assert_allclose(bij.forward_log_det(xs), fldj_auto, rtol=5e-4, atol=5e-4)
    ys = bij.forward(xs)
    np.testing.assert_allclose(bij.inverse_log_det(ys), -fldj_auto, rtol=1e-3, atol=1e-3)


def test_chain_ordering_matches_tf_convention():
    # Chain([f, g]).forward(x) == f(g(x))
    f = Affine(shift=1.0)
    g = Exp()
    chain = Chain((f, g))
    x = jnp.asarray(0.5)
    np.testing.assert_allclose(chain.forward(x), jnp.exp(x) + 1.0, rtol=1e-6)


def test_transformed_distribution_log_prob_lognormal():
    # exp(Normal) == lognormal: verify against scipy.
    d = TransformedDistribution(Normal(0.0, 1.0), Exp(), event_ndims=0)
    y = np.array([0.5, 1.0, 2.5])
    np.testing.assert_allclose(
        d.log_prob(jnp.asarray(y)), stats.lognorm.logpdf(y, 1.0), rtol=1e-5
    )


def test_transformed_distribution_sampling_consistency():
    d = TransformedDistribution(Normal(0.0, 1.0), Softplus(), event_ndims=0)
    s = d.sample(jax.random.key(3), (100_000,))
    assert float(jnp.min(s)) > 0.0
    # Importance check: E[softplus(Z)] for Z~N(0,1)
    z = np.random.default_rng(0).normal(size=200_000)
    want = np.mean(np.logaddexp(z, 0.0))
    assert abs(float(jnp.mean(s)) - want) < 0.02


def test_sum_event():
    x = jnp.ones((4, 3, 2))
    assert sum_event(x, 0).shape == (4, 3, 2)
    assert sum_event(x, 1).shape == (4, 3)
    assert sum_event(x, 2).shape == (4,)
    np.testing.assert_allclose(sum_event(x, 2), 6.0)
