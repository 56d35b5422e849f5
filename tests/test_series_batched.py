"""Batched multi-series learn-theta pipeline (terminal reference variant)."""

import jax
import jax.flatten_util
import numpy as np
import pytest

from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
from viforssms_tpu.data.features import gather_series, series_tables
from viforssms_tpu.data.generate import partial_observe_2d, simulate_lv
from viforssms_tpu.inference.vi.train import VIEngine
from viforssms_tpu.models.lotka_volterra import LotkaVolterraLearnTheta

RATES = (0.5, 0.0025, 0.3)


def _multi_series(num_series=8, target=20, dt=0.2):
    obs_all, bin_all, tt_all = [], [], []
    for j in range(num_series):
        x = simulate_lv(RATES, x0=(91.0, 99.0), dt=dt, T=target * dt, seed=10 + j)
        obs, obs_bin, tt = partial_observe_2d(x, every=4, obs_std=1.0, seed=20 + j)
        obs[obs_bin == 0] = 2.0  # unobserved fill (..._learn_theta.py:810-812)
        obs_all.append(obs)
        bin_all.append(obs_bin)
        tt_all.append(tt * dt)
    cat = lambda xs: np.concatenate(xs, axis=1)
    return cat(obs_all), cat(bin_all), cat(tt_all)


def test_series_tables_shapes_and_gather():
    obs, obs_bin, tt = _multi_series(num_series=6, target=20)
    tables, spec = series_tables(obs, obs_bin, tt, 6, kernel_len=4, no_flows=3,
                                 feat_window=3, x0=(91.0, 99.0), dt=0.2)
    assert tables.feat.shape[0] == 6
    assert spec.batch_dims == 20 and spec.kernel_ext == 12 + 40 + 2
    batch = gather_series(tables, spec, np.array([0, 3, 5], np.int32))
    assert batch.feats.shape == (3, spec.kernel_ext, 6)
    assert batch.bin_feed.shape == (3, 2, 20)
    # series are independent blocks: series 3's obs channel differs from series 0's
    assert not np.allclose(batch.feats[0, :, 0], batch.feats[1, :, 0])


@pytest.mark.slow
def test_series_epoch_training():
    num_series, target = 8, 20
    obs, obs_bin, tt = _multi_series(num_series=num_series, target=target)
    tables, spec = series_tables(obs, obs_bin, tt, num_series, kernel_len=4,
                                 no_flows=3, feat_window=3, x0=(91.0, 99.0), dt=0.2)
    cfg = VIConfig(
        p=4, batch_dims=target, T=target,
        flow=FlowConfig(kernel_len=4, no_flows=3, network_dims=(16, 16, 16),
                        feat_window=3, flow_dims=2, mu_softplus=True),
        train=TrainConfig(learn_rate=1e-3, grad_clip=1e9, nan_mask_loss=True),
        theta_num_bijectors=3, theta_softplus=True,
    )
    model = LotkaVolterraLearnTheta(dt=0.2, x0_mean=(91.0, 99.0), x0_std=(1.0, 1.0))
    eng = VIEngine(model=model, cfg=cfg, tables=tables, spec=spec, use_norm=True)
    assert eng.series_mode and eng.num_series == num_series
    state = eng.init(jax.random.key(0))
    state, last = eng.fit_epochs(state, num_epochs=6, pre_train_epochs=2)
    assert last is not None and np.isfinite(float(last.elbo))
    paths = eng.sample_series_paths(state.params, jax.random.key(1))
    assert paths.shape == (num_series, 2, target)
    assert np.all(paths > 1.0)


def test_series_epoch_training_learned_obs_scale():
    """4-param variant (lotka_volterra_latest.py): learned obs-noise factor
    trains end-to-end; q(theta) has 4 positive coordinates."""
    from viforssms_tpu.models.lotka_volterra import LotkaVolterraLearnObsScale

    num_series, target = 8, 20
    obs, obs_bin, tt = _multi_series(num_series=num_series, target=target)
    tables, spec = series_tables(obs, obs_bin, tt, num_series, kernel_len=4,
                                 no_flows=3, feat_window=3, x0=(91.0, 99.0), dt=0.2)
    cfg = VIConfig(
        p=4, batch_dims=target, T=target,
        flow=FlowConfig(kernel_len=4, no_flows=3, network_dims=(16, 16, 16),
                        feat_window=3, flow_dims=2, mu_softplus=True),
        train=TrainConfig(learn_rate=1e-3, grad_clip=1e9, nan_mask_loss=True),
        theta_num_bijectors=3, theta_softplus=True,
    )
    model = LotkaVolterraLearnObsScale(dt=0.2, x0_mean=(91.0, 99.0), x0_std=(1.0, 1.0))
    eng = VIEngine(model=model, cfg=cfg, tables=tables, spec=spec, use_norm=True)
    state = eng.init(jax.random.key(0))
    state, last = eng.fit_epochs(state, num_epochs=6, pre_train_epochs=2)
    assert last is not None and np.isfinite(float(last.elbo))
    th = eng.sample_theta(state.params, jax.random.key(2), 128)
    assert th.shape == (128, 4)
    assert np.all(th > 0) and np.all(np.isfinite(th))


def test_scanned_epochs_match_per_epoch_dispatch():
    """train_epochs(n) (one dispatch) must reproduce n train_epoch calls
    exactly — the production multi-epoch scan is a pure dispatch-shape
    change (round 4: per-epoch dispatch paid ~25 ms tunnel tax per 2-batch
    epoch at the bench shape)."""
    num_series, target = 8, 20
    obs, obs_bin, tt = _multi_series(num_series=num_series, target=target)
    tables, spec = series_tables(obs, obs_bin, tt, num_series, kernel_len=4,
                                 no_flows=3, feat_window=3, x0=(91.0, 99.0),
                                 dt=0.2)
    cfg = VIConfig(
        p=4, batch_dims=target, T=target,
        flow=FlowConfig(kernel_len=4, no_flows=3, network_dims=(8, 8, 8),
                        feat_window=3, flow_dims=2, mu_softplus=True),
        train=TrainConfig(learn_rate=1e-3, grad_clip=1e9, nan_mask_loss=True),
        theta_num_bijectors=3, theta_softplus=True,
    )
    model = LotkaVolterraLearnTheta(dt=0.2, x0_mean=(91.0, 99.0),
                                    x0_std=(1.0, 1.0))
    eng = VIEngine(model=model, cfg=cfg, tables=tables, spec=spec,
                   use_norm=True, donate=False)
    idx_mat = np.stack([np.arange(0, 4, dtype=np.int32),
                        np.arange(4, 8, dtype=np.int32)])
    s0 = eng.init(jax.random.key(0))
    sa = s0
    elbos = []
    for _ in range(3):
        sa, ms = eng.train_epoch(sa, idx_mat)
        elbos.append(float(np.mean(np.asarray(ms.elbo))))
    sb, epoch_elbo, last = eng.train_epochs(s0, idx_mat, 3)
    np.testing.assert_allclose(np.asarray(epoch_elbo), np.asarray(elbos),
                               rtol=1e-6)
    fa = np.asarray(jax.flatten_util.ravel_pytree(sa.params)[0])
    fb = np.asarray(jax.flatten_util.ravel_pytree(sb.params)[0])
    np.testing.assert_allclose(fb, fa, rtol=1e-6, atol=1e-7)
    assert int(sb.step) == int(sa.step) == 6
