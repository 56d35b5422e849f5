"""Closed-form transformed densities of the learn-theta LV model vs an
independent autodiff change-of-variables computation."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from viforssms_tpu.models.lotka_volterra import _SDE_CHAIN, LotkaVolterraLearnTheta


def _autodiff_ildj(f_inv, y):
    """log |d f^{-1}/dy| per element, via autodiff (independent of the model's
    closed forms)."""
    g = jax.vmap(jax.grad(f_inv))(y.reshape(-1)).reshape(y.shape)
    return jnp.log(jnp.abs(g))


def test_sde_chain_inverse_and_ildj():
    f = lambda u: jnp.logaddexp(u - 1.0, 0.0) + 1.0  # softplus(x-1)+1
    y = jnp.linspace(1.05, 6.0, 23)
    u = _SDE_CHAIN.inverse(y)
    np.testing.assert_allclose(jax.vmap(f)(u), y, rtol=1e-5, atol=1e-5)
    ildj = _SDE_CHAIN.inverse_log_det(y)
    want = _autodiff_ildj(lambda t: _SDE_CHAIN.inverse(t), y)
    np.testing.assert_allclose(np.asarray(ildj), np.asarray(want), rtol=1e-3, atol=1e-3)


def test_x0_log_prob_matches_manual_change_of_variables():
    model = LotkaVolterraLearnTheta(x0_mean=(91.0, 99.0), x0_std=(1.5, 2.0))
    x = jnp.zeros((4, 2, 3))
    x0 = jnp.asarray([[91.5, 99.2], [90.0, 101.0], [92.3, 98.1], [91.0, 99.0]])
    x = x.at[:, :, 1].set(x0)
    got = model.x0_log_prob(x)
    # manual: log N(f^{-1}(x0); mean, std) + sum log|d f^{-1}/dx|
    u = np.asarray(_SDE_CHAIN.inverse(x0))
    ildj = np.asarray(_autodiff_ildj(lambda t: _SDE_CHAIN.inverse(t), x0)).sum(-1)
    want = (
        stats.norm.logpdf(u[:, 0], 91.0, 1.5)
        + stats.norm.logpdf(u[:, 1], 99.0, 2.0)
        + ildj
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_observation_log_prob_is_transformed_normal_density():
    """p(y) must be the density of y = f(eps), eps ~ N(x, 0.2x) — checked by
    Monte Carlo against the model's closed form via a histogram-free
    importance identity: E[1] under the density ≈ 1 over a grid."""
    model = LotkaVolterraLearnTheta()
    x_val = 3.0
    x = jnp.full((1, 2, 2), x_val)
    grid = jnp.linspace(1.01, 12.0, 3000)
    ys = jnp.stack([grid, grid], axis=0)[None, :, :]  # can't vary W; use per-point calls
    # evaluate pointwise: obs term for a single step window
    def point_density(y):
        yw = jnp.full((1, 2, 1), y)
        mask = jnp.ones((1, 2, 1))
        lp = model.observation_log_prob(x, yw, mask, None)
        return jnp.exp(lp[0] / 2.0)  # lp sums both dims of the same value -> /2

    dens = jax.vmap(point_density)(grid)
    integral = float(jnp.trapezoid(dens, grid))
    assert abs(integral - 1.0) < 2e-2, integral
    # and the density matches a direct MC histogram of y = f(N(x, .2x))
    eps = x_val + 0.2 * x_val * np.random.default_rng(0).standard_normal(200_000)
    y_samp = np.log1p(np.exp(eps - 1.0)) + 1.0
    hist, edges = np.histogram(y_samp, bins=60, range=(1.5, 8.0), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    dens_at_centers = jax.vmap(point_density)(jnp.asarray(centers))
    mask = hist > 0.01
    rel = np.abs(np.asarray(dens_at_centers)[mask] - hist[mask]) / hist[mask]
    assert float(np.median(rel)) < 0.1, float(np.median(rel))


def test_transform_path_log_det_matches_autodiff():
    model = LotkaVolterraLearnTheta()
    raw = jax.random.normal(jax.random.key(0), (2, 2, 5))
    mask = jnp.ones((2, 2, 5))
    shift = jnp.zeros((2, 2, 5))
    x, log_det = model.transform_path(raw, mask, shift)
    # forward map per element: v = softplus(u) + 1 (+1e-6); ildj on window [1:]
    f = lambda u: jnp.logaddexp(u, 0.0) + 1.0 + 1e-6
    fldj = jnp.log(jax.vmap(jax.grad(f))(raw.reshape(-1))).reshape(raw.shape)
    want = -jnp.sum(fldj[:, :, 1:], axis=(1, 2))
    np.testing.assert_allclose(np.asarray(log_det), np.asarray(want), rtol=1e-3,
                               atol=1e-3)


def test_learn_obs_scale_density_and_prior():
    """4-param variant (lotka_volterra_latest.py): the obs term must equal the
    terminal variant's with factor theta[-1] substituted for 0.2, and the
    prior must be a PLAIN Gaussian in positive space (:342-346)."""
    from viforssms_tpu.models.lotka_volterra import LotkaVolterraLearnObsScale

    m4 = LotkaVolterraLearnObsScale()
    assert m4.theta_dim == 4
    x = jnp.full((3, 2, 4), 3.0)
    y = jnp.full((3, 2, 3), 3.4)
    mask = jnp.ones((3, 2, 3))
    fac = jnp.asarray([0.1, 0.2, 0.55])
    theta4 = jnp.concatenate(
        [jnp.tile(jnp.asarray([[0.5, 0.0025, 0.3]]), (3, 1)), fac[:, None]], axis=1)
    got = m4.observation_log_prob(x, y, mask, theta4)
    for i, f in enumerate(np.asarray(fac)):
        ref = LotkaVolterraLearnTheta(obs_noise_factor=float(f))
        want = ref.observation_log_prob(x[i : i + 1], y[i : i + 1], mask[i : i + 1], None)
        np.testing.assert_allclose(float(got[i]), float(want[0]), rtol=1e-5)
    # unobserved steps contribute nothing
    got0 = m4.observation_log_prob(x, y, jnp.zeros_like(mask), theta4)
    np.testing.assert_allclose(np.asarray(got0), 0.0, atol=1e-6)
    # prior: plain MVNDiag over positive theta
    lp = m4.log_prior(theta4)
    want = stats.norm.logpdf(
        np.asarray(theta4), np.asarray(m4.prior_mean), np.asarray(m4.prior_sigma)
    ).sum(-1)
    np.testing.assert_allclose(np.asarray(lp), want, rtol=1e-4)
    # transition ignores the 4th column
    xr = jnp.abs(jax.random.normal(jax.random.key(0), (3, 2, 6))) + 2.0
    t3 = m4.transition_log_prob(xr, theta4[:, :4])
    ref3 = LotkaVolterraLearnTheta().transition_log_prob(xr, theta4[:, :3])
    np.testing.assert_allclose(np.asarray(t3), np.asarray(ref3), rtol=1e-5)
