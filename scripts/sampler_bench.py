"""Sampler throughput on the real chip: iterative NUTS over the AR(1) joint.

The MCMC validators share the models' densities with the VI path
(BASELINE.json north star); this measures their on-chip speed at a
representative size — the AR(1) joint posterior over [theta (3), x_{1:T}]
with T=500 (dim 503), multiple vmapped chains. Numbers recorded in
docs/RESULTS.md.

Usage: python scripts/sampler_bench.py [--chains 8 --T 500]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=8)
    ap.add_argument("--T", type=int, default=500)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--samples", type=int, default=300)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()

    from viforssms_tpu.data.generate import generate_ar1
    from viforssms_tpu.inference.mcmc.nuts import nuts_sample
    from viforssms_tpu.inference.validate import ssm_log_joint
    from viforssms_tpu.models.ar1 import AR1

    theta_true = (5.0, 0.5, 3.0)
    series = generate_ar1(T=args.T, impute=1, x0=10.0, theta=theta_true,
                          obs_std=1.0, seed=0)
    model = AR1(obs_std=1.0, prior_scale=(10.0,) * 3)
    log_joint = ssm_log_joint(model, series.obs[1:], series.obs_bin[1:],
                              x0=10.0, T=args.T)
    dim = 3 + args.T
    init = jnp.concatenate([
        jnp.tile(jnp.asarray([4.0, 0.4, 1.0]), (args.chains, 1)),
        jnp.tile(jnp.asarray(series.obs[1:], jnp.float32), (args.chains, 1)),
    ], axis=1)

    def run(key):
        # chains are vmapped internally (init has a leading chain axis)
        return nuts_sample(
            log_joint, init, key, num_samples=args.samples,
            num_warmup=args.warmup, step_size=0.01, adapt_mass=True)[0]

    t0 = time.perf_counter()
    draws = run(jax.random.key(1))
    float(draws[-1, 0, 0])  # host read = true completion fence
    compile_and_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    draws = run(jax.random.key(2))
    float(draws[-1, 0, 0])
    wall = time.perf_counter() - t0
    total_draws = args.chains * (args.warmup + args.samples)
    print(f"dim={dim} chains={args.chains}: {total_draws / wall:.1f} NUTS "
          f"transitions/s on one chip ({wall:.1f}s steady; "
          f"{compile_and_first:.1f}s incl. compile)")
    th = np.asarray(draws[args.samples // 2:, :, :3]).reshape(-1, 3)  # (samples, chains, dim)
    print("theta posterior mean:", np.round(th.mean(0), 3),
          "(truth", theta_true, ")")


if __name__ == "__main__":
    main()
