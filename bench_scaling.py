"""Scaling benchmark: ELBO-samples/s vs number of devices on the particle axis.

BASELINE.json's scaling metric is samples/s efficiency from 1 to N workers.
On a real pod slice this measures ICI-scaled particle data parallelism; on
this machine it runs over the virtual CPU device mesh (pass
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``),
which validates the machinery — virtual devices share physical cores, so CPU
"efficiency" is not a hardware statement.

Prints one JSON line per mesh size for each of two sharding regimes:
  particle DP:       {"axis": "particles", "devices": n, "samples_per_sec": r, ...}
  sequence sharding: {"axis": "sequence", "devices": n, "steps_per_sec": r, ...}
    (full-path ELBO training, time axis sharded with halo exchange —
     inference/vi/sequence_train.py; fixed total path length = weak scaling
     of the per-device chunk)
"""

from __future__ import annotations

import argparse
import json
import os
import time


def measure(n_devices: int, p_per_device: int = 16, chunk: int = 10):
    import jax

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()

    from __graft_entry__ import _lv_engine
    from viforssms_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((n_devices,), ("particles",)) if n_devices > 1 else None
    import os

    small = os.environ.get("VIFORSSMS_PLATFORM") == "cpu"
    eng = _lv_engine(target=200, batch_dims=50, p=n_devices * p_per_device,
                     kernel_len=20, no_flows=3,
                     net=(16, 16, 16) if small else (50,) * 5,
                     feat_window=10, mesh=mesh)
    state = eng.init(jax.random.key(0))
    state, ms = eng.train_many(state, chunk)
    jax.block_until_ready(ms.elbo)
    t0 = time.perf_counter()
    state, ms = eng.train_many(state, chunk)
    jax.block_until_ready(ms.elbo)
    dt = time.perf_counter() - t0
    steps_per_sec = chunk / dt
    return steps_per_sec * eng.cfg.p  # ELBO samples (particles) per second


def measure_sequence(n_devices: int, T_total: int = 512, p: int = 8,
                     steps: int = 5):
    """Full-path sequence-sharded training throughput at fixed total length."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from viforssms_tpu.flows.nma import NMAFlowStack
    from viforssms_tpu.inference.vi.adamax import clipped_adamax
    from viforssms_tpu.inference.vi.sequence_train import (
        SeqTrainState,
        make_sequence_train_step,
    )
    from viforssms_tpu.models.lotka_volterra import LotkaVolterra
    from viforssms_tpu.parallel.mesh import make_mesh

    small = os.environ.get("VIFORSSMS_PLATFORM") == "cpu"
    d, F = 2, 6
    L = d * T_total
    flow = NMAFlowStack(network_dims=(16, 16, 16) if small else (50,) * 5,
                        kernel_len=20, no_flows=3, batch_dims=T_total,
                        flow_dims=d, use_norm=True, aligned_feats=True)
    ctx = flow.no_flows * flow.kernel_len
    params = flow.init(jax.random.key(0), jnp.zeros((p, L + ctx)),
                       jnp.zeros((p, L + ctx, F)), jnp.zeros((p, 3)))
    feats = 0.1 * jax.random.normal(jax.random.key(1), (p, L, F))
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(3.0, 0.5, (p, 2, T_total)).astype(np.float32))
    m = jnp.asarray((rng.random((p, 2, T_total)) < 0.1).astype(np.float32))
    mesh = make_mesh((n_devices,), ("sequence",))
    opt = clipped_adamax(learning_rate=1e-3, grad_clip=1e9)
    step = make_sequence_train_step(
        model=LotkaVolterra(dt=0.1, prior_scale=(0.3,) * 3), flow=flow,
        opt=opt, mesh=mesh, x0=(3.0, 2.0),
        fix_theta_value=np.log([0.5, 0.0025, 0.3]).astype(np.float32))
    st = SeqTrainState({"flow": params}, opt.init({"flow": params}),
                       jax.random.key(2), jnp.zeros((), jnp.int32))
    st, loss, _ = step(st, feats, y, m)   # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        st, loss, _ = step(st, feats, y, m)
    jax.block_until_ready(loss)
    return steps / (time.perf_counter() - t0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the aggregated machine-readable table "
                         "to this JSON file (e.g. SCALING.json)")
    args = ap.parse_args(argv)

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    # This image's sitecustomize re-pins JAX_PLATFORMS to the single TPU chip,
    # silently defeating `JAX_PLATFORMS=cpu XLA_FLAGS=...device_count=8`. If
    # the caller asked for the virtual host-device farm, honor it.
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        os.environ.setdefault("VIFORSSMS_PLATFORM", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    sizes = [1]
    n = len(jax.devices())
    k = 2
    while k <= n:
        sizes.append(k)
        k *= 2
    rows = []
    base = None
    for s in sizes:
        r = measure(s)
        if base is None:
            base = r
        rows.append({
            "axis": "particles",
            "devices": s,
            "samples_per_sec": round(r, 1),
            "efficiency_vs_1": round(r / (base * s), 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    base = None
    for s in sizes:
        r = measure_sequence(s)
        if base is None:
            base = r
        rows.append({
            "axis": "sequence",
            "devices": s,
            "steps_per_sec": round(r, 2),
            # fixed total length: ideal scaling is constant work/step spread
            # over s devices -> speedup_vs_1 ~ s on real hardware
            "speedup_vs_1": round(r / base, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    if args.out:
        backend = jax.default_backend()
        cores = os.cpu_count()
        out = {
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
            "backend": backend,
            "device_count": n,
            "physical_cores": cores,
            "virtual_cpu_mesh": backend == "cpu",
            "note": (f"virtual CPU devices share {cores} physical cores: "
                     f"per-device efficiency is bounded above by "
                     f"cores/devices (= {cores}/N) before any collective "
                     f"cost, so this table certifies the sharding MACHINERY "
                     f"(every mesh size compiles and trains), not hardware "
                     f"efficiency — run the same command on a pod slice "
                     f"(docs/POD_RUNBOOK.md) for the BASELINE.md >=0.85 @ 4 "
                     f"hosts target" if backend == "cpu" else
                     "real accelerator mesh"),
            "target": "ELBO-samples/s efficiency >= 0.85 at 4 hosts (BASELINE.md)",
            "rows": rows,
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
