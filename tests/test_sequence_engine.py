"""SequenceVIEngine: the productized full-path sequence-sharded trainer.

Contract under test (VERDICT round-1 items 4-5): ONE engine program runs on a
2-D (particles x sequence) mesh — any topology factorization must produce the
SAME loss/metrics as the single-device run (JAX PRNG is value-deterministic,
so sharding is the only variable), for all three data layouts: 2-D
interleaved (LV), 1-D (AR), and SV's observed-dim injection
(``SV_dense.py:193-194,245-246``).
"""

import jax
import numpy as np
import pytest

from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
from viforssms_tpu.data.features import ar1_tables, lv_tables, sv_tables
from viforssms_tpu.data.generate import partial_observe_2d, simulate_lv
from viforssms_tpu.inference.vi.sequence_train import SequenceVIEngine
from viforssms_tpu.models.ar1 import AR1
from viforssms_tpu.models.lotka_volterra import LotkaVolterra
from viforssms_tpu.models.stochastic_volatility import StochasticVolatility
from viforssms_tpu.parallel.mesh import make_mesh


def _lv_engine(mesh):
    rates = (0.5, 0.0025, 0.3)
    dt, target = 0.1, 64
    x = simulate_lv(rates, x0=(100.0, 100.0), dt=dt, T=target * dt, seed=1)
    obs, obs_bin, tt = partial_observe_2d(x, every=8, obs_std=1.0, seed=2)
    cfg = VIConfig(
        p=8, batch_dims=16, T=target,
        flow=FlowConfig(kernel_len=4, no_flows=2, network_dims=(8, 8, 8),
                        feat_window=3, flow_dims=2),
        train=TrainConfig(learn_rate=1e-3, grad_clip=1e9),
    )
    tables, spec = lv_tables(obs, obs_bin, tt * dt, 4, 2, 3, 16,
                             x0=(100.0, 100.0), dt=dt)
    model = LotkaVolterra(dt=dt, prior_mean=tuple(np.log(rates)),
                          prior_scale=(0.3,) * 3, jitter=1e-3)
    return SequenceVIEngine(model=model, cfg=cfg, tables=tables, spec=spec,
                            mesh=mesh, use_norm=True)


def _sv_engine(mesh):
    rng = np.random.default_rng(0)
    obs = np.cumsum(rng.normal(0, 0.05, 65)) + 1.0
    cfg = VIConfig(
        p=8, batch_dims=16, T=64,
        flow=FlowConfig(kernel_len=6, no_flows=2, network_dims=(8, 8, 8),
                        feat_window=2, flow_dims=1),
        train=TrainConfig(learn_rate=1e-3, grad_clip=1e7),
    )
    tables, spec = sv_tables(obs, 6, 2, 2, 16, x0=-7.0)
    eng = SequenceVIEngine(model=StochasticVolatility(), cfg=cfg,
                           tables=tables, spec=spec, mesh=mesh, use_norm=True)
    return eng, obs


def _ar_engine(mesh):
    rng = np.random.default_rng(1)
    obs = rng.normal(10, 3, 64)
    obs_bin = (rng.random(64) < 0.5).astype(np.float32)
    tables, spec = ar1_tables(obs, obs_bin, np.ones(64), 6, 2, 2, 16, x0=10.0)
    cfg = VIConfig(
        p=8, batch_dims=16, T=64,
        flow=FlowConfig(kernel_len=6, no_flows=2, network_dims=(8, 8, 8),
                        feat_window=2, flow_dims=1),
        train=TrainConfig(learn_rate=1e-3, grad_clip=2.5e8),
    )
    return SequenceVIEngine(model=AR1(obs_std=1.0), cfg=cfg, tables=tables,
                            spec=spec, mesh=mesh)


def _one_step(eng):
    state = eng.init(jax.random.key(0))
    state, pre_loss, finite = eng.pretrain_step(state)
    state, m = eng.train_step(state)
    return float(pre_loss), float(m.elbo), float(m.path_lq)


@pytest.mark.parametrize("topo", [(1, 4), (2, 2), (4, 2)])
def test_lv_mesh_invariance(topo):
    ref = _one_step(_lv_engine(None))
    got = _one_step(_lv_engine(make_mesh(topo, ("particles", "sequence"))))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_sv_mesh_invariance_and_injection():
    eng_ref, obs = _sv_engine(None)
    ref = _one_step(eng_ref)
    eng_sh, _ = _sv_engine(make_mesh((2, 4), ("particles", "sequence")))
    got = _one_step(eng_sh)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)
    # observed dim is injected verbatim (SV_dense.py:245-246)
    paths = eng_sh.sample_posterior_paths(
        eng_sh.init(jax.random.key(1)).params, jax.random.key(2))
    assert paths.shape == (8, 2, 64)
    np.testing.assert_allclose(paths[0, 0, :], obs[1:], atol=1e-5)


def test_ar_mesh_invariance():
    ref = _one_step(_ar_engine(None))
    got = _one_step(_ar_engine(make_mesh((4, 2), ("particles", "sequence"))))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


@pytest.mark.slow  # ~7 min on a 2-core CPU host: compiles four scanned
# sequence-mesh programs (pretrain chunk, fit chunk, eval, paths)
def test_fit_improves_and_paths_finite():
    eng = _lv_engine(make_mesh((2, 2), ("particles", "sequence")))
    state = eng.init(jax.random.key(3))
    state = eng.pretrain(state, num_steps=40, scan_chunk=20)
    m0, _ = eng.estimate_elbo(state.params, jax.random.key(4), 4)
    state, last = eng.fit(state, num_steps=60, scan_chunk=20)
    m1, _ = eng.estimate_elbo(state.params, jax.random.key(5), 4)
    assert np.isfinite(m1)
    assert m1 > m0, (m0, m1)
    paths = eng.sample_posterior_paths(state.params, jax.random.key(6))
    assert paths.shape == (8, 2, 64) and np.isfinite(paths).all()


def test_checkpoint_roundtrip(tmp_path):
    """TrainState layout is shared with VIEngine -> Checkpointer works as-is."""
    from viforssms_tpu.utils.checkpoint import Checkpointer

    eng = _ar_engine(None)
    state = eng.init(jax.random.key(7))
    state, _ = eng.fit(state, num_steps=5)
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save(state)
    restored = ck.restore(eng.init(jax.random.key(8)))
    assert restored is not None and int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_derived_data_pins_gather_windows_and_raw_arrays():
    """_derive_data's full-path arrays must agree with (a) the windowed
    gather at every window start and (b) the ORIGINAL obs/obs_bin arrays —
    an independent check of the table-column conventions (ADVICE r2: the
    mesh-invariance tests only compare the engine against itself)."""
    from viforssms_tpu.data.features import gather_windows

    # --- 1-D (AR) ---
    rng = np.random.default_rng(1)
    obs = rng.normal(10, 3, 64)
    obs_bin = (rng.random(64) < 0.5).astype(np.float32)
    tables, spec = ar1_tables(obs, obs_bin, np.ones(64), 6, 2, 2, 16, x0=10.0)
    cfg = VIConfig(
        p=8, batch_dims=16, T=64,
        flow=FlowConfig(kernel_len=6, no_flows=2, network_dims=(8, 8, 8),
                        feat_window=2, flow_dims=1),
        train=TrainConfig(learn_rate=1e-3, grad_clip=2.5e8),
    )
    eng = SequenceVIEngine(model=AR1(obs_std=1.0), cfg=cfg, tables=tables,
                           spec=spec)
    np.testing.assert_allclose(np.asarray(eng.y_full), obs, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(eng.mask_full), obs_bin, rtol=0)
    d, b, ke = spec.flow_dims, spec.batch_dims, spec.kernel_ext
    ctx = eng.context
    for s in spec.window_starts():
        wb = gather_windows(tables, spec, np.asarray([s], np.int32))
        # target region of the windowed gather == the full-path feature rows
        np.testing.assert_array_equal(
            np.asarray(wb.feats[0][ke - d * b:]),
            np.asarray(eng.feats_full[d * s: d * s + d * b]))
    # window 0's context rows == the engine's edge conditioning block
    wb0 = gather_windows(tables, spec, np.asarray([0], np.int32))
    np.testing.assert_array_equal(
        np.asarray(wb0.feats[0][ke - d * b - ctx: ke - d * b]),
        np.asarray(eng.edge_feats))

    # --- 2-D interleaved (LV) ---
    rates = (0.5, 0.0025, 0.3)
    dt, target = 0.1, 64
    x = simulate_lv(rates, x0=(100.0, 100.0), dt=dt, T=target * dt, seed=1)
    obs2, obs_bin2, tt = partial_observe_2d(x, every=8, obs_std=1.0, seed=2)
    cfg2 = VIConfig(
        p=8, batch_dims=16, T=target,
        flow=FlowConfig(kernel_len=4, no_flows=2, network_dims=(8, 8, 8),
                        feat_window=3, flow_dims=2),
        train=TrainConfig(learn_rate=1e-3, grad_clip=1e9),
    )
    tables2, spec2 = lv_tables(obs2, obs_bin2, tt * dt, 4, 2, 3, 16,
                               x0=(100.0, 100.0), dt=dt)
    model2 = LotkaVolterra(dt=dt, prior_mean=tuple(np.log(rates)),
                           prior_scale=(0.3,) * 3, jitter=1e-3)
    eng2 = SequenceVIEngine(model=model2, cfg=cfg2, tables=tables2,
                            spec=spec2, use_norm=True)
    np.testing.assert_allclose(np.asarray(eng2.y_full), obs2, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(eng2.mask_full),
                                  np.asarray(tables2.bin_feed))
    d2, b2, ke2 = spec2.flow_dims, spec2.batch_dims, spec2.kernel_ext
    for s in spec2.window_starts():
        wb = gather_windows(tables2, spec2, np.asarray([s], np.int32))
        np.testing.assert_array_equal(
            np.asarray(wb.feats[0][ke2 - d2 * b2:]),
            np.asarray(eng2.feats_full[d2 * s: d2 * s + d2 * b2]))
    # x0 edge state == the shift table's first column (window-0 pinning)
    np.testing.assert_allclose(np.asarray(eng2.x0),
                               np.asarray(tables2.shift)[:, 0], rtol=0)


def test_sequence_iwae_bound_tightens():
    """iw_k on the sequence engine: same draws -> the per-group IWAE bound
    dominates the mean ELBO deterministically (log-mean-exp >= mean), and a
    train step runs finite. Full-path particles are whole-series importance
    weights by construction, so no window restriction applies."""
    import dataclasses

    eng, _ = _sv_engine(None)
    eng_iw = dataclasses.replace(eng, iw_k=4)
    state = eng.init(jax.random.key(0))
    key = jax.random.key(5)
    loss_elbo, _ = eng._loss(state.params, key)
    loss_iwae, _ = eng_iw._loss(state.params, key)
    # identical key path => identical theta/noise draws; Jensen gives
    # IWAE bound >= mean ELBO, i.e. loss_iwae <= loss_elbo
    assert float(loss_iwae) <= float(loss_elbo) + 1e-5, (
        float(loss_iwae), float(loss_elbo))
    st2, m = eng_iw.train_step(state)
    assert np.isfinite(float(m.elbo))

    with pytest.raises(ValueError):
        dataclasses.replace(eng, iw_k=3)  # 3 does not divide p=8
