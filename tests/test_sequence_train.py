"""Full-path sequence-sharded ELBO: must equal the unsharded computation
(values AND gradients), and a few Adamax steps must increase the ELBO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viforssms_tpu.flows.nma import NMAFlowStack
from viforssms_tpu.flows.sharded import unsharded_reference
from viforssms_tpu.inference.vi.adamax import clipped_adamax
from viforssms_tpu.inference.vi.sequence_train import (
    SeqTrainState,
    make_sequence_train_step,
    sequence_sharded_elbo,
)
from viforssms_tpu.models.ar1 import AR1
from viforssms_tpu.models.lotka_volterra import LotkaVolterra
from viforssms_tpu.parallel.mesh import make_mesh


def _setup(flow_dims, T=32, p=3, F=5, K=4, nf=2):
    L_total = flow_dims * T
    flow = NMAFlowStack(
        network_dims=(8, 8, 8), kernel_len=K, no_flows=nf,
        batch_dims=T, flow_dims=flow_dims,
        use_norm=(flow_dims == 2), aligned_feats=True,
    )
    context = nf * K
    theta_dim = 3
    params = flow.init(
        jax.random.key(3),
        jnp.zeros((p, L_total + context)),
        jnp.zeros((p, L_total + context, F)),
        jnp.zeros((p, theta_dim)),
    )
    z = jax.random.normal(jax.random.key(0), (p, L_total))
    feats = 0.1 * jax.random.normal(jax.random.key(1), (p, L_total, F))
    theta = 0.1 * jax.random.normal(jax.random.key(2), (p, theta_dim))
    return flow, params, z, feats, theta, L_total


def _unsharded_terms(model, flow, params, z, feats, theta, x0, y, obs_mask):
    """Single-device full-path ELBO path terms (the oracle)."""
    p = z.shape[0]
    d = flow.flow_dims
    x_raw, lq = unsharded_reference(flow, params, z, feats, theta)
    W = z.shape[1] // d
    if d == 1:
        raw = x_raw[:, None, :]
    else:
        raw = jnp.transpose(x_raw.reshape(p, W, d), (0, 2, 1))
    if model.uses_mask_shift:
        raw_ext = jnp.concatenate([jnp.zeros((p, d, 1), raw.dtype), raw], axis=2)
        mask = jnp.ones((p, d, W + 1), raw.dtype).at[:, :, 0].set(0.0)
        shift = jnp.zeros((p, d, W + 1), raw.dtype)
        x_t, log_det = model.transform_path(raw_ext, mask, shift)
        body = x_t[:, :, 1:]
        lq = lq + log_det
    else:
        body = raw
    x0_vec = jnp.broadcast_to(jnp.asarray(x0, z.dtype).reshape(-1), (d,))
    edge = jnp.broadcast_to(x0_vec[None, :, None], (p, d, 1))
    x_full = jnp.concatenate([edge, body], axis=2)
    if d == 1:
        x_full = x_full[:, 0, :]
    sde = model.transition_log_prob(x_full, theta)
    obs = model.observation_log_prob(x_full, y, obs_mask, theta)
    return sde - lq + obs, sde, obs, lq


@pytest.mark.slow  # ~4 min/case on a 2-core CPU host (compiles two full
# sharded train programs); the cheap mechanism check stays in the fast tier
# via tests/test_sequence_sharded.py
@pytest.mark.parametrize("model,flow_dims,x0", [
    (AR1(obs_std=0.7), 1, 5.0),
    (LotkaVolterra(dt=0.1, prior_scale=(0.3,) * 3), 2, (3.0, 2.0)),
])
def test_sequence_sharded_elbo_matches_unsharded(model, flow_dims, x0):
    T = 32
    flow, params, z, feats, theta, L_total = _setup(flow_dims, T=T)
    p = z.shape[0]
    rng = np.random.default_rng(0)
    if flow_dims == 1:
        y = jnp.asarray(rng.normal(5.0, 1.0, (p, T)).astype(np.float32))
        obs_mask = jnp.asarray((rng.random((p, T)) < 0.4).astype(np.float32))
    else:
        y = jnp.asarray(rng.normal(3.0, 0.5, (p, 2, T)).astype(np.float32))
        obs_mask = jnp.asarray((rng.random((p, 2, T)) < 0.4).astype(np.float32))

    mesh = make_mesh((4,), ("sequence",))
    t = sequence_sharded_elbo(model, flow, params, z, feats, y, obs_mask,
                              theta, x0, mesh)
    elbo_ref, sde_ref, obs_ref, lq_ref = _unsharded_terms(
        model, flow, params, z, feats, theta, x0, y, obs_mask)
    np.testing.assert_allclose(np.asarray(t.sde_lp), np.asarray(sde_ref),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t.obs_lp), np.asarray(obs_ref),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t.path_lq), np.asarray(lq_ref),
                               rtol=2e-4, atol=2e-3)

    # gradients w.r.t. flow params must also match
    def loss_sharded(prm):
        tt = sequence_sharded_elbo(model, flow, prm, z, feats, y, obs_mask,
                                   theta, x0, mesh)
        return -jnp.mean(tt.elbo)

    def loss_unsharded(prm):
        e, *_ = _unsharded_terms(model, flow, prm, z, feats, theta, x0, y, obs_mask)
        return -jnp.mean(e)

    g_sh = jax.grad(loss_sharded)(params)
    g_ref = jax.grad(loss_unsharded)(params)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_sequence_train_step_improves_elbo():
    model = AR1(obs_std=0.7)
    flow, params, z, feats, theta, L_total = _setup(1, T=32)
    p = 3
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(5.0, 1.0, (p, 32)).astype(np.float32))
    obs_mask = jnp.ones((p, 32), jnp.float32)
    mesh = make_mesh((4,), ("sequence",))
    opt = clipped_adamax(learning_rate=3e-3, grad_clip=1e4)
    fix = np.asarray([1.0, 0.8, 0.0], np.float32)
    step = make_sequence_train_step(model, flow, opt, mesh, x0=5.0,
                                    fix_theta_value=fix)
    state = SeqTrainState({"flow": params}, opt.init({"flow": params}),
                          jax.random.key(0), jnp.zeros((), jnp.int32))
    losses = []
    for _ in range(60):
        state, loss, _ = step(state, feats, y, obs_mask)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 1.0, losses[:3] + losses[-3:]


def test_learn_mean_offset_trains_and_shifts():
    """Round-5 family extension: a learned per-coordinate mean offset in the
    raw path space (translation, log q invariant). Must train (nonzero
    gradient signal), run sharded, and shift sampled paths monotonically."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _lv_engine
    from viforssms_tpu.inference.vi.sequence_train import SequenceVIEngine
    from viforssms_tpu.parallel.mesh import make_mesh

    weng = _lv_engine(target=16, batch_dims=8, p=4, kernel_len=4, no_flows=2,
                      net=(8, 8), feat_window=3)
    eng = SequenceVIEngine.from_windowed(weng, learn_mean_offset=True)
    st = eng.init(jax.random.key(0))
    assert st.params["offset"].shape == (2, 16)
    st, m = eng.train_step(st)
    st, m = eng.train_step(st)
    assert np.isfinite(float(m.elbo))
    assert float(jnp.abs(st.params["offset"]).max()) > 0
    # sharded: 2x4 mesh
    mesh = make_mesh((2, 4), ("particles", "sequence"))
    eng2 = SequenceVIEngine.from_windowed(weng, mesh=mesh,
                                          learn_mean_offset=True)
    st2 = eng2.init(jax.random.key(0))
    st2, m2 = eng2.train_step(st2)
    assert np.isfinite(float(m2.elbo))
    # manual +3 offset must raise every (softplus-positive) path coordinate
    p0 = eng.sample_posterior_paths(st.params, jax.random.key(5))
    hi = dict(st.params)
    hi["offset"] = st.params["offset"] + 3.0
    p1 = eng.sample_posterior_paths(hi, jax.random.key(5))
    assert (p1 > p0).all()
