"""Lotka-Volterra end-to-end integration tests (2-D interleaved stack)."""

import jax
import numpy as np
import pytest

from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
from viforssms_tpu.data.features import lv_tables
from viforssms_tpu.data.generate import partial_observe_2d, simulate_lv
from viforssms_tpu.inference.vi.train import VIEngine
from viforssms_tpu.models.lotka_volterra import LotkaVolterra, LotkaVolterraLearnTheta

RATES = (0.5, 0.0025, 0.3)


def _lv_data(target=40, dt=0.1, every=5):
    x = simulate_lv(RATES, x0=(100.0, 100.0), dt=dt, T=target * dt, seed=4)
    obs, obs_bin, time_till = partial_observe_2d(x, every=every, obs_std=1.0, seed=5)
    # unobserved steps carry the forward-filled value 0 -> keep 0 (masked anyway)
    return x, obs, obs_bin, time_till * dt


def _make_engine(model, target=40, p=8, fix_theta=None, mu_softplus=False):
    x, obs, obs_bin, time_till = _lv_data(target=target)
    cfg = VIConfig(
        p=p, batch_dims=10, T=target,
        flow=FlowConfig(kernel_len=4, no_flows=3, network_dims=(16, 16, 16),
                        feat_window=3, flow_dims=2, mu_softplus=mu_softplus),
        train=TrainConfig(learn_rate=1e-3, grad_clip=1e9, nan_mask_loss=True),
        theta_num_bijectors=3,
        theta_softplus=isinstance(model, LotkaVolterraLearnTheta),
    )
    tables, spec = lv_tables(
        obs, obs_bin, time_till, cfg.flow.kernel_len, cfg.flow.no_flows,
        cfg.flow.feat_window, cfg.batch_dims, x0=(100.0, 100.0), dt=0.1,
    )
    eng = VIEngine(
        model=model, cfg=cfg, tables=tables, spec=spec,
        fix_theta_value=fix_theta, use_norm=True,
    )
    return eng, x


@pytest.mark.slow
def test_lv_fixed_theta_trains_finite():
    model = LotkaVolterra(dt=0.1, prior_mean=tuple(np.log(RATES)), prior_scale=(1e-2,) * 3)
    eng, x = _make_engine(model, fix_theta=np.log(np.asarray(RATES, np.float32)))
    state = eng.init(jax.random.key(0))
    state = eng.pretrain(state, finite_gate=30)
    state, m0 = eng.fit(state, num_steps=1)
    state, m1 = eng.fit(state, num_steps=150)
    assert np.isfinite(float(m1.elbo)), float(m1.elbo)
    assert float(m1.elbo) > float(m0.elbo)
    paths = eng.sample_posterior_paths(state.params, jax.random.key(3))
    assert paths.shape == (8, 2, 40)
    assert np.all(paths > 0), "softplus transform must keep paths positive"


@pytest.mark.slow
def test_lv_learn_theta_variant_trains_finite():
    model = LotkaVolterraLearnTheta(dt=0.1, x0_mean=(100.0, 100.0), x0_std=(1.0, 1.0))
    eng, x = _make_engine(model, mu_softplus=True)
    state = eng.init(jax.random.key(1))
    state = eng.pretrain(state, num_steps=40)
    state, m1 = eng.fit(state, num_steps=80)
    assert np.isfinite(float(m1.elbo))
    th = eng.sample_theta(state.params, jax.random.key(2), 128)
    assert th.shape == (128, 3)
    assert np.all(th > 0), "softplus'd theta posterior must be positive"
    paths = eng.sample_posterior_paths(state.params, jax.random.key(4))
    assert np.all(paths > 1.0), "learn-theta paths live above 1 (softplus(.)+1)"
