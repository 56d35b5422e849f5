"""PMMH: pseudo-marginal exactness against the ideal (Kalman) MH chain.

The pseudo-marginal property says a Metropolis chain that plugs an UNBIASED
evidence estimate into the accept ratio targets the same posterior as one
using the exact evidence. On AR(1) the exact marginal p(y | theta) is the
Kalman likelihood, so we can run both chains and demand moment agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforssms_tpu.data.generate import generate_ar1
from viforssms_tpu.inference.kalman import kalman_ar1
from viforssms_tpu.inference.mcmc.pmmh import pmmh, pmmh_chains, pmmh_for_model
from viforssms_tpu.models.ar1 import AR1

X0, OBS_STD = 5.0, 0.7
PRIOR_LOC = np.array([1.0, 0.8, 0.0], np.float32)
PRIOR_SCALE = 0.5


def _data(T=50):
    s = generate_ar1(T=T, impute=2, x0=X0, theta=(1.0, 0.8, 1.0),
                     obs_std=OBS_STD, seed=3)
    return jnp.asarray(s.obs, jnp.float32), jnp.asarray(s.obs_bin, jnp.float32)


def _log_prior(theta):
    z = (theta - jnp.asarray(PRIOR_LOC)) / PRIOR_SCALE
    return -0.5 * jnp.sum(z * z)


def test_prior_only_chain_samples_the_prior():
    """With a flat likelihood the chain must reproduce the prior."""
    log_ev = lambda k, th: jnp.zeros(())
    res = pmmh(jax.random.key(0), log_ev, _log_prior,
               jnp.asarray(PRIOR_LOC), num_steps=6000, warmup=500,
               init_scale=0.5)
    draws = np.asarray(res.thetas[500:])
    assert 0.05 < float(res.accept_rate) < 0.8
    np.testing.assert_allclose(draws.mean(axis=0), PRIOR_LOC, atol=0.12)
    np.testing.assert_allclose(draws.std(axis=0), PRIOR_SCALE, atol=0.12)


def test_nonfinite_proposals_are_rejected():
    log_ev = lambda k, th: jnp.where(th[0] > 1.0, -jnp.inf, 0.0)
    res = pmmh(jax.random.key(1), log_ev, _log_prior,
               jnp.asarray(PRIOR_LOC) - 1.0, num_steps=500, warmup=0,
               init_scale=0.3)
    assert np.all(np.isfinite(np.asarray(res.thetas)))
    assert np.all(np.asarray(res.thetas)[:, 0] <= 1.0 + 1e-6)


@pytest.mark.slow
def test_pmmh_matches_ideal_kalman_mh():
    obs, obs_bin = _data()

    def log_ev_exact(k, th):
        return kalman_ar1(obs, obs_bin, (th[0], th[1], th[2]), X0, OBS_STD)[0]

    exact = pmmh(jax.random.key(10), log_ev_exact, _log_prior,
                 jnp.asarray(PRIOR_LOC), num_steps=4000, warmup=800,
                 init_scale=0.2)

    model = AR1(obs_std=OBS_STD)
    from viforssms_tpu.inference.validate import smc_evidence_for_model

    def log_ev_smc(k, th):
        return smc_evidence_for_model(
            model, obs, obs_bin, X0, th, 256, k
        ).log_evidence

    pm = pmmh(jax.random.key(11), log_ev_smc, _log_prior,
              jnp.asarray(PRIOR_LOC), num_steps=4000, warmup=800,
              init_scale=0.2)

    d_exact = np.asarray(exact.thetas[800:])
    d_pm = np.asarray(pm.thetas[800:])
    assert 0.05 < float(exact.accept_rate) < 0.8
    assert 0.03 < float(pm.accept_rate) < 0.8
    # moment agreement between the exact and pseudo-marginal chains
    se = d_exact.std(axis=0) / np.sqrt(d_exact.shape[0] / 20.0)  # IACT slack
    np.testing.assert_array_less(
        np.abs(d_pm.mean(axis=0) - d_exact.mean(axis=0)),
        5.0 * se + 0.08,
    )
    np.testing.assert_allclose(d_pm.std(axis=0), d_exact.std(axis=0),
                               rtol=0.5, atol=0.05)


@pytest.mark.slow
def test_pmmh_for_model_wrapper_and_chains():
    obs, obs_bin = _data(T=30)
    model = AR1(obs_std=OBS_STD)
    res = pmmh_for_model(model, obs, obs_bin, X0, PRIOR_LOC,
                         jax.random.key(2), num_steps=200, n_particles=64,
                         warmup=100)
    assert res.thetas.shape == (200, 3)
    assert np.all(np.isfinite(np.asarray(res.log_posts)))

    # vmapped chains: shapes carry the chain axis and chains differ
    theta0s = jnp.tile(jnp.asarray(PRIOR_LOC)[None, :], (2, 1))
    log_ev = lambda k, th: jnp.zeros(())
    multi = pmmh_chains(jax.random.key(3), log_ev, _log_prior, theta0s,
                        num_steps=300, warmup=50, init_scale=0.4)
    assert multi.thetas.shape == (2, 300, 3)
    assert not np.allclose(np.asarray(multi.thetas[0]),
                           np.asarray(multi.thetas[1]))


def test_dispatch_chunking_is_exact():
    """Chunked dispatch must reproduce the single-dispatch chain EXACTLY:
    the carried state (theta, retained lp, adapted scale, PRNG key) is the
    full chain state, so the trajectories are bitwise identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viforssms_tpu.inference.mcmc.pmmh import pmmh, pmmh_chains

    def log_ev(key, th):
        # noisy evidence (exercise the pseudo-marginal retained estimate)
        return -0.5 * jnp.sum(th**2) + 0.1 * jax.random.normal(key, ())

    def log_prior(th):
        return -0.5 * jnp.sum((th / 3.0) ** 2)

    th0 = jnp.asarray([1.0, -0.5])
    a = pmmh(jax.random.key(0), log_ev, log_prior, th0, 200, warmup=50)
    b = pmmh(jax.random.key(0), log_ev, log_prior, th0, 200, warmup=50,
             dispatch_chunk=64)
    np.testing.assert_array_equal(np.asarray(a.thetas), np.asarray(b.thetas))
    np.testing.assert_array_equal(np.asarray(a.accepts), np.asarray(b.accepts))

    th0s = jnp.stack([th0, -th0])
    a = pmmh_chains(jax.random.key(1), log_ev, log_prior, th0s, 150, warmup=30)
    b = pmmh_chains(jax.random.key(1), log_ev, log_prior, th0s, 150, warmup=30,
                    dispatch_chunk=40)
    np.testing.assert_array_equal(np.asarray(a.thetas), np.asarray(b.thetas))
    np.testing.assert_allclose(np.asarray(a.step_scale), np.asarray(b.step_scale))
