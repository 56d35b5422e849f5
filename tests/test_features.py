"""Feature-pipeline parity: jitted gathers vs a NumPy mirror of the reference
minibatch assembly (AR.py:262-288 semantics, lotka_volterra_partial.py:359-386)."""

import jax.numpy as jnp
import numpy as np

from viforssms_tpu.data.features import ar1_tables, gather_windows, lv_tables, sv_tables


def _np_ar_reference(obs, obs_bin, time_till, K, nf, fw, b, starts):
    """Direct NumPy re-derivation of the reference's per-step feed tensors."""
    T = len(obs)
    pad = nf * K + 1
    kext = nf * K + b + 1
    obs_pad_store = [
        np.concatenate([np.zeros(pad - i), obs, np.zeros(i)]) for i in range(fw)
    ]
    bin_feats = np.concatenate([np.ones(pad), np.zeros(T)])
    time_pad = np.concatenate([np.zeros(pad), np.arange(T + 1)])
    tt = np.concatenate([np.arange(pad + time_till[0], time_till[0], -1), time_till])
    ob = np.concatenate([np.zeros(pad), obs_bin])

    rows = []
    for s in starts:
        cols = [item[s : s + kext] for item in obs_pad_store]
        cols += [bin_feats[s : s + kext], time_pad[s : s + kext], tt[s : s + kext], ob[s : s + kext]]
        rows.append(np.stack(cols, axis=1))
    return np.stack(rows)


def test_ar1_gather_matches_reference_assembly():
    rng = np.random.default_rng(0)
    T, K, nf, fw, b = 120, 6, 3, 4, 20
    obs = rng.normal(size=T)
    obs_bin = (rng.random(T) > 0.3).astype(np.float64)
    time_till = rng.integers(0, 5, T).astype(np.float64)
    tables, spec = ar1_tables(obs, obs_bin, time_till, K, nf, fw, b, x0=10.0)
    starts = np.array([0, 20, 40, 100], np.int32)
    batch = gather_windows(tables, spec, jnp.asarray(starts))
    want = _np_ar_reference(obs, obs_bin, time_till, K, nf, fw, b, starts)
    np.testing.assert_allclose(batch.feats, want, rtol=1e-5, atol=1e-5)
    # mask/shift windows (AR.py:285-288)
    mask_vals = np.concatenate([np.zeros((1, 1)), np.ones((1, T))], axis=1)
    shift_vals = np.concatenate([np.array([[10.0]]), np.zeros((1, T))], axis=1)
    for i, s in enumerate(starts):
        np.testing.assert_allclose(batch.mask[i, 0], mask_vals[0, s : s + b + 1])
        np.testing.assert_allclose(batch.shift[i, 0], shift_vals[0, s : s + b + 1])


def _np_lv_reference(obs2, time_till2, K, nf, fw, b, dt, starts):
    d, target = obs2.shape
    pad = nf * K + 2
    kext = nf * K + 2 * b + 2
    obs_flat = np.reshape(obs2, -1, "F")
    obs_pad_store = [
        np.concatenate([np.zeros(pad - i), obs_flat, np.zeros(i)])
        for i in range(0, fw * 5, 5)
    ]
    bin_feats = np.concatenate([np.zeros(pad), np.ones(2 * target)])
    T_real = target * dt
    time_pad = np.concatenate(
        [np.zeros(pad), np.repeat(np.arange(dt, T_real + dt / 2, dt), 2)]
    )
    ttp = np.reshape(
        np.repeat(np.arange(np.round(pad * (dt / 2), 1), 0.0, -dt), 2), (2, -1), "F"
    )
    tt = np.reshape(np.concatenate([ttp, time_till2], 1), -1, "F")
    rows = []
    for s in starts:
        i = 2 * s
        cols = [item[i : i + kext] for item in obs_pad_store]
        cols += [bin_feats[i : i + kext], time_pad[i : i + kext], tt[i : i + kext]]
        rows.append(np.stack(cols, axis=1))
    return np.stack(rows)


def test_lv_gather_matches_reference_assembly():
    rng = np.random.default_rng(1)
    target, K, nf, fw, b, dt = 60, 4, 3, 3, 15, 0.1
    obs2 = rng.normal(size=(2, target)) + 50
    obs_bin2 = (rng.random((2, target)) > 0.5).astype(np.float64)
    tt2 = rng.random((2, target))
    tables, spec = lv_tables(obs2, obs_bin2, tt2, K, nf, fw, b, x0=(100.0, 100.0), dt=dt)
    starts = np.array([0, 15, 45], np.int32)
    batch = gather_windows(tables, spec, jnp.asarray(starts))
    want = _np_lv_reference(obs2, tt2, K, nf, fw, b, dt, starts)
    np.testing.assert_allclose(batch.feats, want, rtol=1e-4, atol=1e-4)
    mask_vals = np.concatenate([np.zeros((2, 1)), np.ones((2, target))], axis=1)
    shift_vals = np.concatenate([np.array([[100.0], [100.0]]), np.zeros((2, target))], axis=1)
    for i, s in enumerate(starts):
        np.testing.assert_allclose(batch.bin_feed[i], obs_bin2[:, s : s + b])
        np.testing.assert_allclose(batch.mask[i], mask_vals[:, s : s + b + 1])
        np.testing.assert_allclose(batch.shift[i], shift_vals[:, s : s + b + 1])
    # obs_eval alignment: channel 0 of the last 2b rows == interleaved obs window
    for i, s in enumerate(starts):
        y = np.asarray(batch.feats[i, -2 * b :, 0]).reshape(b, 2).T
        np.testing.assert_allclose(y, obs2[:, s : s + b], rtol=1e-5)


def test_sv_tables_shapes():
    rng = np.random.default_rng(2)
    n, K, nf, fw, b = 200, 10, 5, 5, 26
    obs = rng.normal(size=n)
    tables, spec = sv_tables(obs, K, nf, fw, b, x0=-8.5)
    assert tables.feat.shape == (nf * K + n, fw + 3)
    starts = np.array([0, 26, 52], np.int32)
    batch = gather_windows(tables, spec, jnp.asarray(starts))
    assert batch.feats.shape == (3, nf * K + b + 1, fw + 3)
    # dim_one windows are raw obs slices (SV_dense.py:327-328)
    for i, s in enumerate(starts):
        np.testing.assert_allclose(batch.dim_one[i], obs[s : s + b + 1], rtol=1e-5)
    # rolling-variance channel is lag-aligned: value at padded index pad+K.. equals var(obs[0:K])
    pad = nf * K
    np.testing.assert_allclose(
        float(tables.feat[(nf + 1) * K, fw + 1]), float(np.var(obs[0:K])), rtol=1e-4
    )


def test_stacked_gather_matches_dynamic_gather():
    """stack_windows + make_stacked_gather must reproduce gather_windows
    exactly for every aligned start (the train step's fast path)."""
    import jax

    from viforssms_tpu.data.features import (
        gather_windows,
        lv_tables,
        make_stacked_gather,
        stack_windows,
        stacked_window_bytes,
    )

    rng = np.random.default_rng(0)
    T = 60
    obs = np.abs(rng.normal(50, 5, (2, T + 1))).astype(np.float32)
    obs_bin = (rng.random((2, T + 1)) < 0.3).astype(np.float32)
    tt = rng.random((2, T + 1)).astype(np.float32)
    tables, spec = lv_tables(obs, obs_bin, tt, 4, 3, 3, 10, x0=(50.0, 50.0), dt=0.1)

    stacked = stack_windows(tables, spec)
    gather = make_stacked_gather(stacked, spec.batch_dims)
    starts = jnp.asarray([0, 10, 50, 30, 30, 0], jnp.int32)
    got = gather(tables, spec, starts)
    want = gather_windows(tables, spec, starts)
    for g, w in zip(got, want):
        assert (g is None) == (w is None)
        if g is not None:
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert stacked_window_bytes(tables, spec) == sum(
        4 * int(np.prod(a.shape[1:])) for a in stacked if a is not None
    ) * spec.num_windows


def test_engine_table_swap_refreshes_stacked_windows():
    """run_series_sweep hot-swaps eng.tables between same-shape series; the
    precomputed window stack must follow (it is passed into the compiled step
    as data, so results must match a fresh engine on the new tables)."""
    import jax

    from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
    from viforssms_tpu.inference.vi.train import VIEngine
    from viforssms_tpu.models.lotka_volterra import LotkaVolterra

    def make_tables(seed):
        rng = np.random.default_rng(seed)
        T = 40
        obs = np.abs(rng.normal(50, 5, (2, T + 1))).astype(np.float32)
        obs_bin = (rng.random((2, T + 1)) < 0.4).astype(np.float32)
        tt = rng.random((2, T + 1)).astype(np.float32)
        return lv_tables(obs, obs_bin, tt, 4, 2, 3, 10, x0=(50.0, 50.0), dt=0.1)

    cfg = VIConfig(
        p=4, batch_dims=10, T=40,
        flow=FlowConfig(kernel_len=4, no_flows=2, network_dims=(8, 8, 8),
                        feat_window=3, flow_dims=2),
        train=TrainConfig(learn_rate=1e-3, grad_clip=1e9),
        theta_num_bijectors=2,
    )
    ta, spec = make_tables(1)
    tb, _ = make_tables(2)
    model = LotkaVolterra(dt=0.1, prior_scale=(0.3,) * 3)
    eng = VIEngine(model=model, cfg=cfg, tables=ta, spec=spec, use_norm=True)
    assert eng._stacked is not None
    state = eng.init(jax.random.key(0))
    starts = jnp.zeros((4,), jnp.int32)
    t_a = eng.eval_terms(state.params, jax.random.key(1), starts)
    eng.tables = tb  # hot swap
    t_b = eng.eval_terms(state.params, jax.random.key(1), starts)
    fresh = VIEngine(model=model, cfg=cfg, tables=tb, spec=spec, use_norm=True)
    t_fresh = fresh.eval_terms(state.params, jax.random.key(1), starts)
    assert not np.allclose(np.asarray(t_a.elbo), np.asarray(t_b.elbo))
    np.testing.assert_allclose(np.asarray(t_b.elbo), np.asarray(t_fresh.elbo), rtol=1e-6)
