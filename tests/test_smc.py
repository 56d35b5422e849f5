"""Bootstrap SMC validation against the exact AR(1) Kalman evidence."""

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.data.generate import generate_ar1
from viforssms_tpu.inference.kalman import kalman_ar1
from viforssms_tpu.inference.smc import bootstrap_filter, systematic_resample


def test_systematic_resample_unbiased():
    lw = jnp.log(jnp.array([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    for i in range(200):
        idx = systematic_resample(jax.random.key(i), lw)
        counts += np.bincount(np.asarray(idx), minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_smc_evidence_matches_kalman():
    T = 60
    theta = (1.0, 0.8, 0.0)
    series = generate_ar1(T=T, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0), obs_std=0.7, seed=3)

    t0, t1, ls = theta
    sig = float(np.exp(ls))

    def transition_sample(key, x):
        return t1 * x + t0 + sig * jax.random.normal(key, x.shape)

    def obs_log_prob(y, x):
        return -0.5 * ((y - x) / 0.7) ** 2 - jnp.log(0.7) - 0.5 * jnp.log(2 * jnp.pi)

    n = 4096
    init = jnp.full((n,), 5.0)
    lls = []
    for seed in range(5):
        res = bootstrap_filter(
            init, transition_sample, obs_log_prob,
            jnp.asarray(series.obs), jnp.asarray(series.obs_bin), jax.random.key(seed),
        )
        lls.append(float(res.log_evidence))
    ll_exact, m_s, _ = kalman_ar1(series.obs, series.obs_bin, theta, 5.0, 0.7)
    assert abs(np.mean(lls) - float(ll_exact)) < 1.5, (np.mean(lls), float(ll_exact))
    # filtering means on observed steps track the data
    obs_idx = np.where(series.obs_bin > 0)[0]
    err = np.abs(np.asarray(res.filter_means)[obs_idx] - series.obs[obs_idx])
    assert float(np.mean(err)) < 1.5
    assert float(jnp.min(res.ess)) > n * 0.01
