"""VI quality diagnostics: GPD tail fit, PSIS k-hat, IWAE bound, SIR, STL.

Pins inference/quality.py against closed forms (known-shape GPD samples,
Gaussian proposal/target pairs with known tail behavior, the AR(1) Kalman
evidence) and the STL estimator's zero-gradient-at-optimum property.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforssms_tpu.inference.quality import (
    gpd_fit,
    iw_elbo,
    log_importance_weights,
    psis,
    sir_resample,
    vi_quality,
)


def _gpd_samples(k, sigma, n, seed):
    u = np.random.RandomState(seed).uniform(size=n)
    if abs(k) < 1e-12:
        return -sigma * np.log1p(-u)
    return sigma / k * (np.power(1.0 - u, -k) - 1.0)


def _normal_logpdf(x, loc, scale):
    return -0.5 * ((x - loc) / scale) ** 2 - np.log(scale) - 0.5 * np.log(2 * np.pi)


class TestGPDFit:
    @pytest.mark.parametrize("k_true", [0.2, 0.5, 0.9])
    def test_recovers_known_shape(self, k_true):
        x = _gpd_samples(k_true, 1.3, 4000, seed=int(k_true * 10))
        k_hat, sigma = gpd_fit(x)
        assert abs(k_hat - k_true) < 0.1
        assert abs(sigma - 1.3) < 0.35

    def test_exponential_tail_is_light(self):
        # k=0 GPD == Exponential: fitted shape should be near zero
        x = _gpd_samples(0.0, 1.0, 4000, seed=0)
        k_hat, _ = gpd_fit(x)
        assert abs(k_hat) < 0.1

    def test_degenerate_input(self):
        k_hat, _ = gpd_fit(np.zeros(3))
        assert not np.isfinite(k_hat)


class TestPSIS:
    def _gaussian_logw(self, sigma_p, n=4000, seed=1):
        """log w for q = N(0,1) draws against target p = N(0, sigma_p)."""
        x = np.random.RandomState(seed).normal(size=n)
        return _normal_logpdf(x, 0.0, sigma_p) - _normal_logpdf(x, 0.0, 1.0), x

    def test_overdispersed_proposal_is_good(self):
        # target narrower than q: bounded weights, light tail
        lw, _ = self._gaussian_logw(0.9)
        res = psis(lw)
        assert res.k_hat < 0.3
        assert res.flag == "good"

    def test_underdispersed_proposal_is_bad(self):
        # target twice as wide as q: w ~ exp(3x^2/8), tail index 3/4 > 0.7
        lw, _ = self._gaussian_logw(2.0)
        res = psis(lw)
        assert res.k_hat > 0.6
        assert res.flag in ("ok", "bad")

    def test_smoothed_weights_normalized_and_capped(self):
        lw, _ = self._gaussian_logw(1.5)
        res = psis(lw)
        w = np.exp(res.log_weights)
        assert abs(w.sum() - 1.0) < 1e-8
        # the cap applies pre-normalization: after self-normalizing, the top
        # smoothed weight can only exceed the raw top by the (tiny) mass the
        # smoothing removed from the tail
        raw = lw - lw.max()
        raw -= np.log(np.exp(raw).sum())
        assert res.log_weights.max() <= raw.max() + 0.05
        assert 1.0 < res.ess <= lw.size

    def test_smoothing_reduces_estimator_error(self):
        # self-normalized IS estimate of E_p[x^2] with a hard proposal:
        # PSIS-smoothed weights should not be worse than raw on average
        errs_raw, errs_psis = [], []
        for seed in range(8):
            lw, x = self._gaussian_logw(1.8, n=2000, seed=seed)
            w_raw = np.exp(lw - lw.max())
            w_raw /= w_raw.sum()
            w_s = np.exp(psis(lw).log_weights)
            truth = 1.8**2
            errs_raw.append(abs(np.sum(w_raw * x * x) - truth))
            errs_psis.append(abs(np.sum(w_s * x * x) - truth))
        assert np.mean(errs_psis) <= np.mean(errs_raw) * 1.25


class TestSIR:
    def test_resampled_moments_match_target(self):
        # q = N(0, 2), p = N(1, 1): exact weights, resampled draws ~ p
        rng = np.random.RandomState(0)
        x = rng.normal(scale=2.0, size=8000)
        lw = _normal_logpdf(x, 1.0, 1.0) - _normal_logpdf(x, 0.0, 2.0)
        out = sir_resample(x, lw, jax.random.key(0), 4000, smooth=True)
        assert abs(out.mean() - 1.0) < 0.1
        assert abs(out.std() - 1.0) < 0.1

    def test_shapes_preserved(self):
        draws = np.arange(200, dtype=np.float32).reshape(100, 2)
        lw = np.zeros(100)
        out = sir_resample(draws, lw, jax.random.key(1), 7, smooth=False)
        assert out.shape == (7, 2)


def _whole_series_engine(T=40, p=64, fix_theta=True):
    """AR(1) engine whose single window spans the whole series
    (batch_dims == T), so per-particle ELBOs are exact log importance
    weights."""
    from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
    from viforssms_tpu.data.features import ar1_tables
    from viforssms_tpu.data.generate import generate_ar1
    from viforssms_tpu.inference.vi.train import VIEngine
    from viforssms_tpu.models.ar1 import AR1

    theta_true = (1.0, 0.8, 0.0)
    series = generate_ar1(T=T, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0),
                          obs_std=0.7, seed=3)
    cfg = VIConfig(
        p=p, batch_dims=T, T=T,
        flow=FlowConfig(kernel_len=6, no_flows=2, network_dims=(16, 16),
                        feat_window=4),
        train=TrainConfig(learn_rate=3e-3, grad_clip=1e4, pre_train_steps=40),
        theta_num_bijectors=3,
    )
    tables, spec = ar1_tables(
        series.obs, series.obs_bin, series.time_till,
        cfg.flow.kernel_len, cfg.flow.no_flows, cfg.flow.feat_window,
        cfg.batch_dims, x0=5.0,
    )
    eng = VIEngine(
        model=AR1(obs_std=0.7), cfg=cfg, tables=tables, spec=spec,
        fix_theta_value=np.asarray(theta_true, np.float32) if fix_theta else None,
        theta_base_loc=1.5, theta_base_scale=0.5,
    )
    return eng, series, theta_true


@pytest.mark.slow
class TestIWAEAgainstKalman:
    def test_bounds_sandwich_and_tighten(self):
        from viforssms_tpu.inference.kalman import kalman_ar1

        eng, series, theta_true = _whole_series_engine()
        assert eng.spec.num_windows == 1 and abs(eng.cfg.elbo_scale - 1.0) < 1e-9
        state = eng.init(jax.random.key(0))
        state = eng.pretrain(state, num_steps=40)
        state, _ = eng.fit(state, num_steps=400)

        ll = float(kalman_ar1(series.obs, series.obs_bin, theta_true, 5.0, 0.7)[0])
        lw = log_importance_weights(eng, state.params, jax.random.key(7),
                                    num_batches=32)
        elbo = float(lw.mean())
        l8 = iw_elbo(lw, K=8)
        l_all = iw_elbo(lw)
        se = float(lw.std() / np.sqrt(lw.size))
        # ELBO <= IWAE_8 <= IWAE_all <= log Z, within MC slack
        assert elbo <= l8 + 3 * se
        assert l8 <= l_all + 3 * se
        assert l_all <= ll + 1.0
        # the tighter bound must actually close most of the gap
        assert (ll - l_all) < (ll - elbo)

    def test_quality_report_on_trained_fit(self):
        eng, _, _ = _whole_series_engine()
        state = eng.init(jax.random.key(1))
        state = eng.pretrain(state, num_steps=40)
        state, _ = eng.fit(state, num_steps=400)
        rep = vi_quality(eng, state.params, jax.random.key(2), num_batches=16)
        assert np.isfinite(rep.elbo) and np.isfinite(rep.iwae)
        assert rep.iwae >= rep.elbo - 0.5
        assert rep.n_samples == 16 * eng.cfg.p
        assert rep.flag in ("good", "ok", "bad")
        assert rep.as_dict()["k_hat"] == rep.k_hat

    def test_windowed_engine_is_rejected(self):
        from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
        from viforssms_tpu.data.features import ar1_tables
        from viforssms_tpu.data.generate import generate_ar1
        from viforssms_tpu.inference.vi.train import VIEngine
        from viforssms_tpu.models.ar1 import AR1

        series = generate_ar1(T=60, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0),
                              obs_std=0.7, seed=3)
        cfg = VIConfig(
            p=8, batch_dims=20, T=60,
            flow=FlowConfig(kernel_len=6, no_flows=2, network_dims=(8, 8),
                            feat_window=4),
            train=TrainConfig(),
        )
        tables, spec = ar1_tables(
            series.obs, series.obs_bin, series.time_till, 6, 2, 4, 20, x0=5.0)
        eng = VIEngine(model=AR1(obs_std=0.7), cfg=cfg, tables=tables, spec=spec,
                       fix_theta_value=np.zeros(3, np.float32))
        with pytest.raises(ValueError, match="whole-series"):
            log_importance_weights(eng, eng.init(jax.random.key(0)).params,
                                   jax.random.key(1))


class TestIWAETraining:
    def test_loss_is_group_iwae_of_per_particle_elbos(self):
        eng, _, _ = _whole_series_engine(T=30, p=16)
        eng.iw_k = 8
        state = eng.init(jax.random.key(0))
        starts = jnp.asarray(np.zeros(16, np.int32))
        key = jax.random.key(5)
        loss, _ = eng._loss(state.params, key, starts)
        t = eng._terms(state.params, key, starts)
        g = np.asarray(t.elbo).reshape(2, 8)
        m = g.max(axis=1, keepdims=True)
        iw = (m[:, 0] + np.log(np.mean(np.exp(g - m), axis=1))).mean()
        np.testing.assert_allclose(float(loss), -iw, rtol=1e-5)
        # the IWAE loss can only be tighter than the plain ELBO loss
        assert -float(loss) >= float(np.asarray(t.elbo).mean()) - 1e-5

    def test_grouped_starts_share_windows(self):
        eng, _, _ = _whole_series_engine(T=30, p=16)
        eng.iw_k = 4
        starts = np.asarray(eng._sample_starts(jax.random.key(3)))
        groups = starts.reshape(-1, 4)
        assert np.all(groups == groups[:, :1])

    def test_invalid_configs_rejected(self):
        eng, _, _ = _whole_series_engine(T=30, p=16)
        with pytest.raises(ValueError, match="divide"):
            dataclasses.replace(eng, iw_k=3)
        # windowed (multi-window) engines cannot train on IWAE groups
        from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
        from viforssms_tpu.data.features import ar1_tables
        from viforssms_tpu.data.generate import generate_ar1
        from viforssms_tpu.inference.vi.train import VIEngine
        from viforssms_tpu.models.ar1 import AR1

        series = generate_ar1(T=60, impute=2, x0=5.0, theta=(1.0, 0.8, 1.0),
                              obs_std=0.7, seed=3)
        cfg = VIConfig(p=8, batch_dims=20, T=60,
                       flow=FlowConfig(kernel_len=6, no_flows=2,
                                       network_dims=(8, 8), feat_window=4),
                       train=TrainConfig())
        tables, spec = ar1_tables(series.obs, series.obs_bin, series.time_till,
                                  6, 2, 4, 20, x0=5.0)
        with pytest.raises(ValueError, match="whole-series"):
            VIEngine(model=AR1(obs_std=0.7), cfg=cfg, tables=tables, spec=spec,
                     fix_theta_value=np.zeros(3, np.float32), iw_k=4)

    @pytest.mark.slow
    def test_iwae_training_reaches_tight_bound(self):
        eng, series, theta_true = _whole_series_engine(T=40, p=64)
        eng.iw_k = 8
        eng._build_steps()
        state = eng.init(jax.random.key(0))
        state = eng.pretrain(state, num_steps=40)
        state, m = eng.fit(state, num_steps=400)
        assert np.isfinite(float(m.elbo))
        from viforssms_tpu.inference.kalman import kalman_ar1

        ll = float(kalman_ar1(series.obs, series.obs_bin, theta_true, 5.0, 0.7)[0])
        rep = vi_quality(eng, state.params, jax.random.key(1), num_batches=16)
        # IWAE-trained fit must land within a nat of the exact evidence
        assert rep.iwae > ll - 1.0


class TestThetaSTL:
    def test_stl_gradient_vanishes_at_optimum(self):
        """When q == p exactly, every STL per-sample gradient is zero while
        the standard estimator's is not (Roeder et al. 2017, prop. 1)."""
        from viforssms_tpu.inference.vi.theta_flow import RealNVPPosterior

        flow = RealNVPPosterior(dim=3, num_bijectors=2, hidden=(8,))
        params = flow.init(jax.random.key(0), jax.random.key(1), 4)
        target = jax.tree.map(lambda a: a.copy(), params)  # p := q at init

        def log_p(theta):
            return flow.apply(target, theta, method=RealNVPPosterior.log_prob)

        def loss_std(p_, key):
            th, lq = flow.apply(p_, key, 64,
                                method=RealNVPPosterior.sample_and_log_prob)
            return -jnp.mean(log_p(th) - lq)

        def loss_stl(p_, key):
            th, _ = flow.apply(p_, key, 64,
                               method=RealNVPPosterior.sample_and_log_prob)
            lq = flow.apply(jax.lax.stop_gradient(p_), th,
                            method=RealNVPPosterior.log_prob)
            return -jnp.mean(log_p(th) - lq)

        key = jax.random.key(42)
        g_std = jax.grad(loss_std)(params, key)
        g_stl = jax.grad(loss_stl)(params, key)
        n_std = float(jnp.linalg.norm(jax.flatten_util.ravel_pytree(g_std)[0]))
        n_stl = float(jnp.linalg.norm(jax.flatten_util.ravel_pytree(g_stl)[0]))
        assert n_stl < 1e-5
        assert n_std > 1e-3

    def test_engine_theta_stl_trains_and_matches_value(self):
        """STL changes only gradients: the theta_lq VALUE must agree with the
        standard estimator under the same key, and training stays finite."""
        eng, _, _ = _whole_series_engine(T=30, p=16, fix_theta=False)
        eng_stl, _, _ = _whole_series_engine(T=30, p=16, fix_theta=False)
        eng_stl.theta_stl = True
        eng_stl._build_steps()

        state = eng.init(jax.random.key(0))
        state_stl = eng_stl.init(jax.random.key(0))
        starts = jnp.zeros((16,), jnp.int32)
        t_a = eng.eval_terms(state.params, jax.random.key(5), starts)
        t_b = eng_stl.eval_terms(state_stl.params, jax.random.key(5), starts)
        np.testing.assert_allclose(np.asarray(t_a.theta_lq),
                                   np.asarray(t_b.theta_lq), rtol=1e-4, atol=1e-4)

        state_stl, m = eng_stl.fit(state_stl, num_steps=30)
        assert np.isfinite(float(m.elbo))


def test_snis_moments_debiases_shifted_proposal():
    """SNIS with exact log-weights recovers the target's moments from a
    biased/underdispersed proposal — the debiasing contract behind the
    full-path importance evaluation (sequence_train.importance_draws)."""
    from viforssms_tpu.inference.quality import snis_moments

    rng = np.random.default_rng(0)
    # proposal N(0.5, 0.8^2); target N(0, 1) per coordinate (2-D)
    S = 200_000
    draws = 0.5 + 0.8 * rng.normal(size=(S, 2))
    def logpdf(x, mu, sd):
        return -0.5 * ((x - mu) / sd) ** 2 - np.log(sd)
    lw = (logpdf(draws, 0.0, 1.0) - logpdf(draws, 0.5, 0.8)).sum(axis=1)
    mean, sd, se_mean, ps = snis_moments(draws, lw)
    assert np.all(np.abs(mean) < 0.02), mean            # raw bias was 0.5
    assert np.all(np.abs(sd - 1.0) < 0.03), sd          # raw sd was 0.8
    assert ps.k_hat < 0.7
    # the SE must cover the residual error at ~3 sigma
    assert np.all(np.abs(mean) < 3 * se_mean + 0.02)
