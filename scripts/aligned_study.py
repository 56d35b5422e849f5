"""Quality study: transposed (reference-parity) vs aligned 2-D feature mode.

The reference's 2-D flows project the FULL feature window through a transposed
dense layer whose width tracks the conv length (``lotka_volterra_partial.py:
75-79``) — quadratic FLOPs in the window. ``FlowConfig.aligned_feats_2d``
keeps features locally aligned instead (the 1-D feature path), which is ~2x
faster at production scale but changes the variational family. This script
answers "does it cost posterior quality?": same data, same seed, same budget,
both modes, on the LV-partial recovery task with learnable rates.

Run (real TPU):  python scripts/aligned_study.py --steps 20000
Emits one JSON line per mode plus a summary comparison.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(aligned: bool, steps: int, seed: int = 1, anchor: bool = False):
    import jax
    import jax.numpy as jnp

    from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
    from viforssms_tpu.data.features import lv_tables
    from viforssms_tpu.data.generate import partial_observe_2d, simulate_lv
    from viforssms_tpu.inference.vi.train import VIEngine
    from viforssms_tpu.models.lotka_volterra import LotkaVolterra

    # LV-partial reference geometry with learnable rates (docs/RESULTS.md,
    # "Lotka-Volterra partial observation at reference scale")
    p, kernel_len, dt, T = 50, 20, 0.1, 50.0
    batch_dims, no_flows, fw = 50, 3, 10
    x0 = (100.0, 100.0)
    truth = (0.5, 0.0025, 0.3)

    x_true = simulate_lv(truth, x0=x0, dt=dt, T=T, seed=1)
    obs, obs_bin, tt = partial_observe_2d(x_true, every=10, obs_std=1.0, seed=2)
    tt = tt * dt

    cfg = VIConfig(
        p=p, batch_dims=batch_dims, T=int(T / dt),
        flow=FlowConfig(kernel_len=kernel_len, no_flows=no_flows,
                        network_dims=(50,) * 5, feat_window=fw, flow_dims=2,
                        aligned_feats_2d=aligned),
        train=TrainConfig(learn_rate=1e-3, grad_clip=1e9, nan_mask_loss=True,
                          seed=seed),
        theta_num_bijectors=4,
    )
    tables, spec = lv_tables(obs, obs_bin, tt, kernel_len, no_flows, fw,
                             batch_dims, x0=x0, dt=dt)
    model = LotkaVolterra(dt=dt, prior_mean=tuple(np.log(truth)),
                          prior_scale=(0.3,) * 3, jitter=1e-3,
                          pretrain_theta_anchor=tuple(np.log(truth)) if anchor
                          else None)
    eng = VIEngine(model=model, cfg=cfg, tables=tables, spec=spec, use_norm=True)

    state = eng.init(jax.random.key(seed))
    state = eng.pretrain(state, finite_gate=1000, scan_chunk=250)
    t0 = time.time()
    state, last = eng.fit(state, num_steps=steps, scan_chunk=250)
    jax.block_until_ready(state.params)
    train_wall = time.time() - t0

    elbo, elbo_se = eng.estimate_elbo(state.params, jax.random.key(seed + 5))
    theta = np.exp(eng.sample_theta(state.params, jax.random.key(seed + 6), 20_000))
    paths = eng.sample_posterior_paths(state.params, jax.random.key(seed + 7))
    mean_path = paths.mean(axis=0)          # (2, target)
    mae = float(np.mean(np.abs(mean_path - x_true[:, 1:1 + mean_path.shape[1]])))

    n_params = sum(int(np.prod(a.shape)) for a in
                   jax.tree.leaves(state.params["flow"]))
    return {
        "mode": "aligned" if aligned else "transposed",
        "steps": steps,
        "train_wall_s": round(train_wall, 1),
        "steps_per_s": round(steps / train_wall, 1),
        "elbo": round(elbo, 1),
        "elbo_se": round(elbo_se, 2),
        "rate_post_mean": [round(float(m), 5) for m in theta.mean(0)],
        "rate_post_sd": [round(float(s), 6) for s in theta.std(0)],
        "rate_truth": [0.5, 0.0025, 0.3],
        "path_mae": round(mae, 3),
        "flow_params": n_params,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20_000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--theta-anchor", action="store_true",
                    help="pre-train with the reference's t2 theta regression")
    args = ap.parse_args()
    results = []
    for aligned in (False, True):
        r = run_mode(aligned, args.steps, args.seed, anchor=args.theta_anchor)
        print(json.dumps(r), flush=True)
        results.append(r)
    t, a = results
    print(json.dumps({
        "speedup_aligned": round(t["train_wall_s"] / a["train_wall_s"], 2),
        "elbo_delta_aligned_minus_transposed": round(a["elbo"] - t["elbo"], 1),
        "path_mae_delta": round(a["path_mae"] - t["path_mae"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
