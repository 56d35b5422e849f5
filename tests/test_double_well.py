"""The EXTENDING.md tutorial model end-to-end: a user-defined SSM (double-well
diffusion, no reference counterpart) trains under the shared VI stack and its
path posterior agrees with HMC run on the SAME model densities."""

import jax
import numpy as np
import pytest

from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
from viforssms_tpu.data.features import ar1_tables
from viforssms_tpu.data.generate import partial_observe_1d, simulate_double_well
from viforssms_tpu.inference.vi.train import VIEngine
from viforssms_tpu.models.double_well import DoubleWell

THETA_TRUE = (np.log(2.0), 1.0, np.log(0.5))  # (log a, b, log s)


def _make_engine(fix_theta=True, T_steps=200, p=16):
    x = simulate_double_well(THETA_TRUE, x0=1.0, dt=0.1, T=T_steps * 0.1, seed=5)
    obs, obs_bin, time_till = partial_observe_1d(x, every=5, obs_std=0.3, seed=6)
    cfg = VIConfig(
        p=p, batch_dims=25, T=T_steps,
        flow=FlowConfig(kernel_len=8, no_flows=2, network_dims=(16, 16, 16),
                        feat_window=5),
        train=TrainConfig(learn_rate=3e-3, grad_clip=1e4, pre_train_steps=60),
        theta_num_bijectors=3,
    )
    tables, spec = ar1_tables(
        obs, obs_bin, time_till * 0.1, cfg.flow.kernel_len, cfg.flow.no_flows,
        cfg.flow.feat_window, cfg.batch_dims, x0=1.0,
    )
    model = DoubleWell(dt=0.1, obs_std=0.3)
    eng = VIEngine(
        model=model, cfg=cfg, tables=tables, spec=spec,
        fix_theta_value=np.asarray(THETA_TRUE, np.float32) if fix_theta else None,
    )
    return eng, x, (obs, obs_bin)


def test_double_well_trains_finite():
    eng, x, _ = _make_engine(fix_theta=True)
    state = eng.init(jax.random.key(0))
    state = eng.pretrain(state, num_steps=60)
    state, m0 = eng.fit(state, num_steps=1)
    state, m1 = eng.fit(state, num_steps=250)
    assert np.isfinite(float(m1.elbo))
    assert float(m1.elbo) > float(m0.elbo)
    paths = eng.sample_posterior_paths(state.params, jax.random.key(1))
    assert paths.shape == (eng.cfg.p, 200) and np.all(np.isfinite(paths))


def test_double_well_forecast_finite():
    eng, _, _ = _make_engine(fix_theta=True, T_steps=100)
    from viforssms_tpu.inference.forecast import posterior_predictive

    state = eng.init(jax.random.key(0))
    state = eng.pretrain(state, num_steps=40)
    state, _ = eng.fit(state, num_steps=100)
    fan, theta = posterior_predictive(eng, state.params, jax.random.key(2), horizon=12)
    assert fan.shape == (eng.cfg.p, 12) and np.all(np.isfinite(fan))
    assert theta.shape == (eng.cfg.p, 3)


@pytest.mark.slow
def test_double_well_vi_path_posterior_matches_hmc():
    """Fixed-theta VI smoothing means vs HMC on the same log-density
    (the BASELINE.json acceptance shape, applied to the tutorial model)."""
    from viforssms_tpu.inference.mcmc import hmc_sample
    from viforssms_tpu.inference.validate import compare_moments, path_log_posterior

    T = 100
    eng, x, (obs, obs_bin) = _make_engine(fix_theta=True, T_steps=T, p=32)
    state = eng.init(jax.random.key(0))
    state = eng.pretrain(state, num_steps=60)
    state, _ = eng.fit(state, num_steps=900)
    draws = []
    for s in range(6):
        draws.append(eng.sample_posterior_paths(state.params, jax.random.key(10 + s)))
    vi_paths = np.concatenate(draws, axis=0)[:, :T]

    model = DoubleWell(dt=0.1, obs_std=0.3)
    logp = path_log_posterior(model, obs[:T], obs_bin[:T], 1.0,
                              np.asarray(THETA_TRUE, np.float32), T)
    init = jax.numpy.asarray(np.tile(obs[None, :T], (8, 1))
                             + 0.1 * np.random.RandomState(0).normal(size=(8, T)))
    samples, _ = hmc_sample(logp, init, jax.random.key(1), num_samples=600,
                            num_warmup=400, step_size=0.05, num_leapfrog=32)
    # keep the HMC chain axis so compare_moments computes real Geyer ESS;
    # VI draws are iid so their ESS ~ their count. VI carries an O(1)
    # mode-seeking bias, so the bar is wider than the 2-SE sampler-vs-exact
    # bar: median |z| over coordinates must stay small relative to the
    # combined MC error.
    cmp = compare_moments(vi_paths, np.asarray(samples))
    assert float(np.median(cmp.z)) < 6.0, (np.median(cmp.z), cmp.z[:10])
