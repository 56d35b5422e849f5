"""AR(1) end-to-end integration tests against the exact Kalman oracle.

The minimum end-to-end slice of SURVEY.md §7.2: data gen -> feature tables ->
NMA flow -> exact AR transition ELBO -> Adamax; ELBO must approach the exact
evidence log p(y | theta) with theta fixed, and posterior path means must
track the Kalman smoother.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
from viforssms_tpu.data.features import ar1_tables
from viforssms_tpu.data.generate import generate_ar1
from viforssms_tpu.inference.kalman import kalman_ar1
from viforssms_tpu.inference.vi.train import VIEngine
from viforssms_tpu.models.ar1 import AR1

THETA_TRUE = (1.0, 0.8, 0.0)  # (theta0, theta1, log sigma)


def _make_engine(fix_theta=True, T=200, p=32, steps_cfg=None):
    series = generate_ar1(T=T, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0), obs_std=0.7, seed=3)
    cfg = VIConfig(
        p=p,
        batch_dims=25,
        T=T,
        flow=FlowConfig(kernel_len=8, no_flows=2, network_dims=(24, 24, 24), feat_window=5),
        train=steps_cfg or TrainConfig(learn_rate=3e-3, grad_clip=1e4, pre_train_steps=60),
        theta_num_bijectors=3,
    )
    tables, spec = ar1_tables(
        series.obs, series.obs_bin, series.time_till,
        cfg.flow.kernel_len, cfg.flow.no_flows, cfg.flow.feat_window,
        cfg.batch_dims, x0=5.0,
    )
    model = AR1(obs_std=0.7)
    eng = VIEngine(
        model=model, cfg=cfg, tables=tables, spec=spec,
        fix_theta_value=np.asarray(THETA_TRUE, np.float32) if fix_theta else None,
        theta_base_loc=1.5, theta_base_scale=0.5,
    )
    return eng, series


@pytest.mark.slow
def test_ar1_fixed_theta_elbo_approaches_kalman_evidence():
    eng, series = _make_engine(fix_theta=True)
    state = eng.init(jax.random.key(0))
    state = eng.pretrain(state, num_steps=60)
    state, metrics = eng.fit(state, num_steps=700)

    # exact evidence for the same data/theta
    ll, m_s, P_s = kalman_ar1(series.obs, series.obs_bin, THETA_TRUE, 5.0, 0.7)
    ll = float(ll)

    # average ELBO over several estimator draws
    elbos = []
    key = jax.random.key(123)
    for _ in range(20):
        key, sub = jax.random.split(key)
        state, m = eng.fit(state, num_steps=1)
        elbos.append(float(m.elbo))
    elbo = float(np.mean(elbos))
    assert np.isfinite(elbo)
    # ELBO lower-bounds the evidence (up to MC noise) and should be close
    assert elbo < ll + 10.0, (elbo, ll)
    assert elbo > ll - 0.25 * abs(ll) - 20.0, (elbo, ll)

    # posterior paths track the Kalman smoother
    paths = eng.sample_posterior_paths(state.params, jax.random.key(7))  # (p, T)
    mean_path = paths.mean(axis=0)
    rmse = float(np.sqrt(np.mean((mean_path - np.asarray(m_s)) ** 2)))
    scale = float(np.std(np.asarray(m_s)))
    assert rmse < 0.35 * scale, (rmse, scale)


def test_ar1_learn_theta_smoke():
    eng, _ = _make_engine(fix_theta=False, T=100, p=16)
    state = eng.init(jax.random.key(1))
    state = eng.pretrain(state, num_steps=20)
    state, m0 = eng.fit(state, num_steps=1)
    state, m1 = eng.fit(state, num_steps=60)
    assert np.isfinite(float(m1.elbo))
    assert float(m1.elbo) > float(m0.elbo)  # training makes progress
    th = eng.sample_theta(state.params, jax.random.key(2), 256)
    assert th.shape == (256, 3) and np.all(np.isfinite(th))


def test_warm_init_online_continuation():
    """New observations extend the series: rebuild tables at the new T, drop
    the trained params in via warm_init, and continue — the warm engine's
    very first ELBO on the extended series beats a cold init's by a wide
    margin (the posterior transfers; parameter shapes are T-independent)."""
    eng, series = _make_engine(fix_theta=True, T=200)
    state = eng.init(jax.random.key(0))
    state = eng.pretrain(state, num_steps=60)
    state, _ = eng.fit(state, num_steps=300)

    longer = generate_ar1(T=300, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0),
                          obs_std=0.7, seed=3)  # same process, longer record
    cfg2 = dataclasses.replace(eng.cfg, T=300)
    tables2, spec2 = ar1_tables(
        longer.obs, longer.obs_bin, longer.time_till,
        cfg2.flow.kernel_len, cfg2.flow.no_flows, cfg2.flow.feat_window,
        cfg2.batch_dims, x0=5.0,
    )
    eng2 = VIEngine(model=AR1(obs_std=0.7), cfg=cfg2, tables=tables2, spec=spec2,
                    fix_theta_value=np.asarray(THETA_TRUE, np.float32),
                    theta_base_loc=1.5, theta_base_scale=0.5)
    warm = eng2.warm_init(jax.random.key(1), state.params)
    cold = eng2.init(jax.random.key(1))

    def first_elbo(st):
        _, m = eng2.fit(st, num_steps=1)
        return float(m.elbo)

    e_warm, e_cold = first_elbo(warm), first_elbo(cold)
    assert np.isfinite(e_warm)
    assert e_warm > e_cold + 100.0, (e_warm, e_cold)
    # warm_init copies params, so the donating fit above must not have
    # deleted the caller's buffers; a fresh warm state keeps training
    warm2 = eng2.warm_init(jax.random.key(2), state.params)
    warm2, m = eng2.fit(warm2, num_steps=50)
    assert np.isfinite(float(m.elbo))
