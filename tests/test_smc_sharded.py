"""Sharded SMC: 8-device particle mesh must match Kalman evidence and the
single-device filter."""

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.data.generate import generate_ar1
from viforssms_tpu.inference.kalman import kalman_ar1
from viforssms_tpu.inference.smc.sharded import sharded_bootstrap_filter
from viforssms_tpu.parallel.mesh import make_mesh

THETA = (1.0, 0.8, 0.0)


def test_sharded_smc_matches_kalman():
    T = 60
    series = generate_ar1(T=T, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0),
                          obs_std=0.7, seed=3)
    t0, t1, ls = THETA
    sig = float(np.exp(ls))

    def transition_sample(key, x):
        return t1 * x + t0 + sig * jax.random.normal(key, x.shape)

    def obs_log_prob(y, x):
        return -0.5 * ((y - x) / 0.7) ** 2 - jnp.log(0.7) - 0.5 * jnp.log(2 * jnp.pi)

    mesh = make_mesh((8,), ("particles",))
    n = 8192
    lls = []
    last = None
    for seed in range(4):
        res = sharded_bootstrap_filter(
            jnp.full((n,), 5.0), transition_sample, obs_log_prob,
            jnp.asarray(series.obs), jnp.asarray(series.obs_bin),
            jax.random.key(seed), mesh,
        )
        lls.append(float(res.log_evidence))
        last = res
    ll_exact, m_s, _ = kalman_ar1(series.obs, series.obs_bin, THETA, 5.0, 0.7)
    assert abs(np.mean(lls) - float(ll_exact)) < 1.5, (np.mean(lls), float(ll_exact))
    assert float(jnp.min(last.ess)) > n * 0.01
    obs_idx = np.where(series.obs_bin > 0)[0]
    err = np.abs(np.asarray(last.filter_means)[obs_idx] - series.obs[obs_idx])
    assert float(np.mean(err)) < 1.5
