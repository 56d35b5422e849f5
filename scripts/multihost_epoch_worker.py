"""Multi-process worker: series-DP EPOCH training across hosts.

The terminal reference variant trains 1024 independent series through a
tf.data epoch loop on one device (``..._learn_theta.py:602-731``). Here the
same ``VIEngine.fit_epochs`` program runs on a GLOBAL mesh whose ``particles``
axis spans processes: every epoch batch of p (theta, series) particles is
split across hosts, per-particle ELBO/gradient work is process-local, and the
gradient mean becomes a psum crossing the process boundary (the DCN analog of
the ICI particle sharding). Run one copy per process:

    python scripts/multihost_epoch_worker.py <process_id> <num_processes> <port> [epochs]

All processes must compute bit-identical epoch ELBOs (replicated params +
tables + PRNG); the final line prints ``EPOCH_ELBOS ...`` for the test.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from viforssms_tpu.parallel import multihost

    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=n_proc, process_id=pid)

    import numpy as np

    from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
    from viforssms_tpu.data.features import WindowTables, series_tables
    from viforssms_tpu.data.generate import partial_observe_2d, simulate_lv
    from viforssms_tpu.inference.vi.train import VIEngine
    from viforssms_tpu.models.lotka_volterra import LotkaVolterraLearnTheta

    mesh = multihost.global_mesh(("particles",))
    n_dev = mesh.shape["particles"]
    print(f"proc {pid}: {n_dev} global devices "
          f"({jax.local_device_count()} local)", flush=True)

    # identical synthetic multi-series data on every process (replicated)
    num_series, tgt, dt = 2 * n_dev, 16, 0.2
    obs_l, bin_l, tt_l = [], [], []
    for j in range(num_series):
        x = simulate_lv((0.5, 0.0025, 0.3), x0=(91.0, 99.0), dt=dt,
                        T=tgt * dt, seed=40 + j)
        o, b, t2 = partial_observe_2d(x, every=4, obs_std=1.0, seed=70 + j)
        o[b == 0] = 2.0
        obs_l.append(o), bin_l.append(b), tt_l.append(t2 * dt)
    cat = lambda arrs: np.concatenate(arrs, axis=1)
    tables, spec = series_tables(cat(obs_l), cat(bin_l), cat(tt_l), num_series,
                                 kernel_len=4, no_flows=2, feat_window=3,
                                 x0=(91.0, 99.0), dt=dt)
    cfg = VIConfig(p=n_dev, batch_dims=tgt, T=tgt,
                   flow=FlowConfig(kernel_len=4, no_flows=2,
                                   network_dims=(8, 8, 8), feat_window=3,
                                   flow_dims=2, mu_softplus=True),
                   train=TrainConfig(learn_rate=1e-3, grad_clip=1e9,
                                     nan_mask_loss=True),
                   theta_num_bijectors=3, theta_softplus=True)
    eng = VIEngine(model=LotkaVolterraLearnTheta(dt=dt, x0_mean=(91.0, 99.0),
                                                 x0_std=(1.0, 1.0)),
                   cfg=cfg, tables=tables, spec=spec, use_norm=True,
                   mesh=mesh, donate=False)

    state = eng.init(jax.random.key(0))
    # globalize: tables + full TrainState (typed PRNG key handled)
    eng.tables = WindowTables(*multihost.replicate_global(mesh, tuple(tables)))
    state = multihost.replicate_state(mesh, state)

    elbos = []
    for _ in range(epochs):
        state, last = eng.fit_epochs(state, num_epochs=1, pre_train_epochs=0)
        elbos.append(float(jax.device_get(last.elbo)))
    finite = all(np.isfinite(elbos)) and any(e != 0.0 for e in elbos)
    agree = multihost.all_processes_equal(elbos[-1], tol=0.0)
    print(f"proc {pid}: finite={finite} losses agree across processes: {agree}",
          flush=True)
    print("EPOCH_ELBOS " + " ".join(f"{e:.6f}" for e in elbos), flush=True)
    assert finite and agree


if __name__ == "__main__":
    main()
