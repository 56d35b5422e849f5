"""SV study: windowed vs FULL-PATH (sequence-engine) variational training.

The windowed engine trains on batch_dims=52 sub-windows with a 29x ELBO
rescaling (``SV_dense.py:404-418`` semantics); the round-2 sequence engine
optimizes the exact full-path ELBO of the whole 1508-step series
(``inference/vi/sequence_train.SequenceVIEngine``). Both share the same flow
family and model, so comparing their posteriors against the SAME cached
joint-NUTS gold standard isolates what the window subsampling costs.

Requires validation/sv/gold_joint_nuts.npz (produced by
``scripts/validate_baseline.py sv``). Writes validation/sv_fullpath.json.

Run on the TPU:  python scripts/sv_fullpath_study.py [--steps 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from validate_baseline import (  # noqa: E402
    VAL_DIR,
    _dat_dir,
    _path_block,
    _theta_block,
    _vi_paths_batched,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20_000)
    ap.add_argument("--pretrain", type=int, default=1_000)
    args = ap.parse_args()

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import jax

    from viforssms_tpu.cli.experiments import build_sv_dense
    from viforssms_tpu.inference.vi.sequence_train import SequenceVIEngine
    from viforssms_tpu.utils.checkpoint import Checkpointer

    gold_path = os.path.join(VAL_DIR, "sv", "gold_joint_nuts.npz")
    assert os.path.exists(gold_path), "run validate_baseline.py sv first"
    with np.load(gold_path) as z:
        gold = z["gold"]                                  # (n, C, 4+T)

    weng, info = build_sv_dense(sv_file=os.path.join(_dat_dir(), "SV.dat"))
    eng = SequenceVIEngine.from_windowed(weng)            # 1x1 mesh, one chip
    cfg_dir = os.path.join(VAL_DIR, "sv_fullpath")
    os.makedirs(cfg_dir, exist_ok=True)
    ckpt = Checkpointer(os.path.join(cfg_dir, "ckpt"))
    state = eng.init(jax.random.key(1))
    restored = ckpt.restore(state)
    t0 = time.time()
    if restored is not None and int(restored.step) > 0:
        state = restored
        deficit = args.steps - int(restored.step)
        print(f"restored at step {int(state.step)}", flush=True)
        if deficit > 0:
            state, _ = eng.fit(state, num_steps=deficit, scan_chunk=50)
            ckpt.save(state)
    else:
        state = eng.pretrain(state, num_steps=args.pretrain, scan_chunk=50)
        state, _ = eng.fit(state, num_steps=args.steps, scan_chunk=50)
        ckpt.save(state)
    wall = time.time() - t0
    print(f"full-path SV trained in {wall:.0f}s "
          f"({(args.steps + args.pretrain) / max(wall, 1e-9):.1f} steps/s)",
          flush=True)

    vi_theta = eng.sample_theta(state.params, jax.random.key(42), 20_000)
    theta = _theta_block(vi_theta, gold[:, :, :4],
                         ("t0_drift", "t1_mean", "t2_rate", "t3_vol"))
    vi_lat = _vi_paths_batched(eng, state.params, jax.random.key(44), 6)[:, 1, :]
    paths = _path_block(vi_lat, gold[:, :, 4:])

    elbo, se = eng.estimate_elbo(state.params, jax.random.key(45), 10)
    out = {
        "config": "sv_fullpath",
        "gold_standard": "same cached joint NUTS as validation/sv.json",
        "vi_steps": args.steps,
        "elbo_fullpath": [elbo, se],
        "theta": theta,
        "paths": paths,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(VAL_DIR, "sv_fullpath.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("saved validation/sv_fullpath.json", flush=True)
    for i, n in enumerate(theta["names"]):
        print(f"{n}: vi {theta['vi_mean'][i]:.3f}±{theta['vi_sd'][i]:.3f} "
              f"gold {theta['gold_mean'][i]:.3f}±{theta['gold_sd'][i]:.3f} "
              f"bias/sd {theta['bias_in_posterior_sd'][i]:.2f}", flush=True)


if __name__ == "__main__":
    main()
