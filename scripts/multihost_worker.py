"""Multi-process worker: full-path sequence-sharded VI training across hosts.

Each process drives its local devices; together they form one global mesh
whose ``sequence`` axis spans processes, so the flow's halo exchanges and the
ELBO psums cross the process boundary (DCN analog). Run one copy per process:

    python scripts/multihost_worker.py <process_id> <num_processes> <port> [steps]

All processes must compute bit-identical losses (replicated params + data +
PRNG); the final line prints ``LOSSES <first> <last>`` for the test harness.
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
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 40

    from viforssms_tpu.parallel import multihost

    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=n_proc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    from viforssms_tpu.flows.nma import NMAFlowStack
    from viforssms_tpu.inference.vi.adamax import clipped_adamax
    from viforssms_tpu.inference.vi.sequence_train import (
        SeqTrainState,
        make_sequence_train_step,
    )
    from viforssms_tpu.models.lotka_volterra import LotkaVolterra

    mesh = multihost.global_mesh(("sequence",))
    n_dev = mesh.shape["sequence"]
    print(f"proc {pid}: {n_dev} global devices "
          f"({jax.local_device_count()} local)", flush=True)

    T, p, F, d = 16 * n_dev, 2, 5, 2
    L = d * T
    flow = NMAFlowStack(network_dims=(8, 8, 8), kernel_len=4, no_flows=2,
                        batch_dims=T, flow_dims=d, use_norm=True,
                        aligned_feats=True)
    ctx = flow.no_flows * flow.kernel_len
    params = flow.init(jax.random.key(0), jnp.zeros((p, L + ctx)),
                       jnp.zeros((p, L + ctx, F)), jnp.zeros((p, 3)))
    rng = np.random.default_rng(0)
    feats_np = (0.1 * rng.normal(size=(p, L, F))).astype(np.float32)
    y_np = rng.normal(3.0, 0.5, (p, 2, T)).astype(np.float32)
    m_np = (rng.random((p, 2, T)) < 0.3).astype(np.float32)

    opt = clipped_adamax(learning_rate=1e-3, grad_clip=1e9)
    step = make_sequence_train_step(
        model=LotkaVolterra(dt=0.1, prior_scale=(0.3,) * 3), flow=flow,
        opt=opt, mesh=mesh, x0=(3.0, 2.0),
        fix_theta_value=np.log([0.5, 0.0025, 0.3]).astype(np.float32))

    # globalize everything that crosses the jit boundary; legacy uint32 key
    # so the PRNG state is an ordinary globalizable array
    opt_state = opt.init({"flow": params})
    glob = lambda tree: multihost.replicate_global(mesh, tree)
    st = SeqTrainState(glob({"flow": params}), glob(opt_state),
                       glob(jax.random.PRNGKey(7)),
                       glob(jnp.zeros((), jnp.int32)))
    from jax.sharding import PartitionSpec as P

    feats = glob(feats_np)
    y = glob(y_np)
    m = glob(m_np)

    losses = []
    for _ in range(steps):
        st, loss, _ = step(st, feats, y, m)
        losses.append(float(jax.device_get(loss)))
    assert np.isfinite(losses).all(), losses
    k = max(len(losses) // 4, 1)
    assert np.mean(losses[-k:]) < np.mean(losses[:k]), (losses[:3], losses[-3:])
    agree = multihost.all_processes_equal(losses[-1])
    print(f"proc {pid}: losses agree across processes: {agree}", flush=True)
    assert agree
    print(f"LOSSES {losses[0]:.6f} {losses[-1]:.6f}", flush=True)


if __name__ == "__main__":
    main()
