"""Tests for the MADE/MAF theta posterior."""

import jax
import jax.numpy as jnp
import numpy as np

from viforssms_tpu.inference.vi.theta_flow import MADE, ThetaPosterior, made_masks


def test_made_masks_autoregressive():
    masks, out_mask = made_masks(3, (5, 5))
    # Composite connectivity: out_i must not see input j >= i.
    conn = masks[0] @ masks[1] @ out_mask  # (3 in, 3 out)
    for i in range(3):
        for j in range(3):
            if j >= i:
                assert conn[j, i] == 0, (i, j)


def test_made_jacobian_strictly_triangular():
    made = MADE(dim=4, hidden=(5, 5, 5))
    x = jnp.array([0.3, -0.2, 0.7, 0.1])
    params = made.init(jax.random.key(0), x)
    for head in range(2):
        jac = jax.jacobian(lambda t: made.apply(params, t)[head])(x)
        np.testing.assert_allclose(np.triu(np.asarray(jac)), 0.0, atol=1e-7)


def test_theta_posterior_sample_log_prob_consistency():
    """log_prob(theta) evaluated on drawn samples must match the returned log q."""
    for softplus in (False, True):
        flow = ThetaPosterior(dim=3, num_bijectors=4, softplus=softplus)
        key = jax.random.key(42)
        params = flow.init(key, key, 7)
        theta, log_q = flow.apply(params, key, 16, method=ThetaPosterior.sample_and_log_prob)
        assert theta.shape == (16, 3)
        assert log_q.shape == (16,)
        log_q2 = flow.apply(params, theta, method=ThetaPosterior.log_prob)
        np.testing.assert_allclose(log_q, log_q2, rtol=2e-3, atol=2e-3)
        if softplus:
            assert float(jnp.min(theta)) > 0.0


def test_theta_posterior_base_params():
    # AR uses base Normal(1.5, 0.5) (AR.py:389)
    flow = ThetaPosterior(dim=3, num_bijectors=5, base_loc=1.5, base_scale=0.5)
    key = jax.random.key(0)
    params = flow.init(key, key, 2)
    theta, log_q = flow.apply(params, key, 4, method=ThetaPosterior.sample_and_log_prob)
    assert np.all(np.isfinite(theta)) and np.all(np.isfinite(log_q))


def test_theta_posterior_normalization_1d_like():
    """With dim=1 the density must integrate to ~1 over a wide grid."""
    flow = ThetaPosterior(dim=1, num_bijectors=3)
    key = jax.random.key(1)
    params = flow.init(key, key, 2)
    grid = jnp.linspace(-12, 12, 4001)[:, None]
    lp = flow.apply(params, grid, method=ThetaPosterior.log_prob)
    integral = float(jnp.trapezoid(jnp.exp(lp), dx=24 / 4000))
    assert abs(integral - 1.0) < 2e-2, integral


def test_realnvp_posterior_log_prob_consistency():
    """RealNVP posterior: sample_and_log_prob's density must equal log_prob
    re-evaluated at the samples (exact single-pass inverse), with and without
    the softplus terminal."""
    from viforssms_tpu.inference.vi.theta_flow import RealNVPPosterior

    for softplus in (False, True):
        flow = RealNVPPosterior(dim=3, num_bijectors=4, hidden=(8, 8),
                                softplus=softplus, base_loc=0.5, base_scale=0.8)
        params = flow.init(jax.random.key(0), jax.random.key(1), 4)
        th, lq = flow.apply(params, jax.random.key(2), 512,
                            method=RealNVPPosterior.sample_and_log_prob)
        lq2 = flow.apply(params, th, method=RealNVPPosterior.log_prob)
        np.testing.assert_allclose(np.asarray(lq), np.asarray(lq2),
                                   rtol=1e-4, atol=1e-4)
        if softplus:
            assert np.all(np.asarray(th) > 0)
        # normalization sanity: importance identity E_q[1] via self-density
        assert np.all(np.isfinite(np.asarray(lq)))


def test_realnvp_trains_in_engine():
    """VIConfig(theta_flow_type='realnvp') runs end-to-end and moves theta."""
    import jax as _jax

    from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
    from viforssms_tpu.data.features import ar1_tables
    from viforssms_tpu.data.generate import generate_ar1
    from viforssms_tpu.inference.vi.train import VIEngine
    from viforssms_tpu.models.ar1 import AR1

    series = generate_ar1(T=300, impute=1, x0=10.0, theta=(5.0, 0.5, 3.0),
                          obs_std=1.0, seed=0)
    cfg = VIConfig(
        p=8, batch_dims=30, T=300,
        flow=FlowConfig(kernel_len=10, no_flows=2, network_dims=(16, 16, 16),
                        feat_window=3),
        train=TrainConfig(learn_rate=1e-3, grad_clip=2.5e8),
        theta_num_bijectors=3, theta_flow_type="realnvp",
    )
    tables, spec = ar1_tables(series.obs, series.obs_bin, series.time_till,
                              10, 2, 3, 30, x0=10.0)
    eng = VIEngine(model=AR1(), cfg=cfg, tables=tables, spec=spec,
                   theta_base_loc=1.5, theta_base_scale=0.5)
    state = eng.init(_jax.random.key(0))
    state = eng.pretrain(state, num_steps=20)
    state, m0 = eng.fit(state, num_steps=1)
    state, m1 = eng.fit(state, num_steps=150)
    assert np.isfinite(float(m1.elbo))
    assert float(m1.elbo) > float(m0.elbo)
    th = eng.sample_theta(state.params, _jax.random.key(1), 256)
    assert th.shape == (256, 3) and np.all(np.isfinite(th))
