"""Scaling benchmark: ELBO-samples/s vs number of devices on the particle axis.

BASELINE.json's scaling metric is samples/s efficiency from 1 to N workers.
On a real pod slice this measures ICI-scaled particle data parallelism; on
this machine it runs over the virtual CPU device mesh (pass
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``),
which validates the machinery — virtual devices share physical cores, so CPU
"efficiency" is not a hardware statement.

Prints one JSON line per mesh size:
  {"devices": n, "samples_per_sec": r, "efficiency_vs_1": e}
"""

from __future__ import annotations

import json
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


def main():
    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import jax

    sizes = [1]
    n = len(jax.devices())
    k = 2
    while k <= n:
        sizes.append(k)
        k *= 2
    base = None
    for s in sizes:
        r = measure(s)
        if base is None:
            base = r
        print(json.dumps({
            "devices": s,
            "samples_per_sec": round(r, 1),
            "efficiency_vs_1": round(r / (base * s), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
