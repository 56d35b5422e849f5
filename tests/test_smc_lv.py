"""Bootstrap SMC on the 2-D LV model via its own transition sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.data.generate import partial_observe_2d, simulate_lv
from viforssms_tpu.inference.smc import bootstrap_filter
from viforssms_tpu.models.lotka_volterra import LotkaVolterra

RATES = (0.5, 0.0025, 0.3)


def test_lv_smc_tracks_latent_path():
    dt, target = 0.1, 80
    x = simulate_lv(RATES, x0=(100.0, 100.0), dt=dt, T=target * dt, seed=11)
    obs, obs_bin, _ = partial_observe_2d(x, every=5, obs_std=1.0, seed=12)
    model = LotkaVolterra(dt=dt)
    theta = jnp.asarray(RATES)

    def transition(key, particles):
        return model.transition_sample(key, particles, theta)

    def obs_lp(y, particles):
        return -0.5 * jnp.sum(((y - particles) / 1.0) ** 2, axis=-1)

    n = 4096
    init = jnp.tile(jnp.asarray([[100.0, 100.0]]), (n, 1))
    res = bootstrap_filter(
        init, transition, obs_lp,
        jnp.asarray(obs.T),                # (T, 2)
        jnp.asarray(obs_bin[0]),           # both dims observed together
        jax.random.key(0),
    )
    assert np.isfinite(float(res.log_evidence))
    assert float(jnp.min(res.ess)) > 10
    # filtering means track the true latent path
    fm = np.asarray(res.filter_means)     # (T, 2)
    err = np.abs(fm - x[:, 1:].T).mean()
    assert err < 5.0, err
