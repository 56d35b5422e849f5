"""Second headline bench: batched learn-theta training throughput.

The reference's terminal variant (``..._learn_theta.py:787-802``) trains a
shared theta posterior over 1024 series at p=128 via a tf.data epoch loop:
precomputed per-series feature tensors, one ``sess.run([train_step, merged,
mean_loss])`` dispatch + host fetch per batch (``:623-707``). Round 2 ran the
full schedule at ~38 steps/s without the step-cost treatment the LV-partial
bench got (VERDICT r2 item 6).

This script measures, on the same chip and the same compiled math:

  * ``reference_loop``: the reference's LOOP SHAPE — one dispatch per batch
    with a per-step host fetch of the loss (the tf.data epoch loop's
    structure; features are device-resident as tf.data staged them);
  * ``production``: the production path — scanned epochs (``train_epoch``:
    one dispatch per epoch), aligned 2-D features, stacked gathers, bf16
    MXU passes, flat Adamax.

Emits one JSON line (also consumed by bench.py --all). Both measurements run
fresh each invocation — the dominant cost is the one-time engine build.

Run:  python scripts/bench_learn_theta.py [--scan-epochs 128]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _engines(num_series: int, p_val: int):
    from viforssms_tpu.cli.experiments import build_lv_learn_theta

    eng, info = build_lv_learn_theta(synthetic=True, num_series=num_series,
                                     p_val=p_val)
    # production settings: bf16 MXU passes (quality validated on the LV
    # bench, docs/RESULTS.md), aligned feats + stacked gathers are already
    # the engine defaults. Round 5 adds bf16 ACTIVATIONS through the
    # conv/tower (FlowConfig.compute_dtype): +6.5% steps/s at this
    # bandwidth-mixed shape with matched training ELBO
    # (validation/mfu_study.json: base -1603 vs bf16_act -1591 after equal
    # schedules). Densities/ELBO stay f32.
    prod = dataclasses.replace(
        eng, matmul_precision="bfloat16",
        cfg=dataclasses.replace(
            eng.cfg, flow=dataclasses.replace(eng.cfg.flow,
                                              compute_dtype="bfloat16")))
    return eng, prod, info


def measure(num_series: int = 256, p_val: int = 128, scan_epochs: int = 128,
            ref_steps: int = 30) -> dict:
    import jax

    eng, prod, _ = _engines(num_series, p_val)
    per_epoch = num_series // p_val
    idx_mat = np.stack([
        np.arange(i, i + p_val, dtype=np.int32)
        for i in range(0, num_series - p_val + 1, p_val)
    ])

    # --- production: multi-epoch scanned dispatches (train_epochs) ---
    # an epoch at this shape is only num_series/p = 2 batches; dispatching
    # per epoch pays ~25 ms of tunnel overhead for ~7 ms of compute
    # (docs/RESULTS.md dispatch study), so production scans many epochs
    # per dispatch (fit_epochs scan_epochs)
    # scan_epochs epochs per dispatch (default 128 -> 256 steps/dispatch:
    # fully amortizes the ~25 ms tunnel call while staying far under the
    # worker's multi-minute dispatch kill — 652 steps/s measured at 300
    # steps/dispatch, scripts/roofline.py). Honored as given so a quick
    # bench can actually run small dispatches (ADVICE r4).
    scan_ep = scan_epochs
    state = prod.init(jax.random.key(0))
    state, _, ms = prod.train_epochs(state, idx_mat, scan_ep)   # compile
    float(ms.elbo)
    rates = []
    for i in range(4):
        t0 = time.perf_counter()
        state, _, ms = prod.train_epochs(state, idx_mat, scan_ep)
        float(ms.elbo)                                  # completion fence
        if i > 0:
            rates.append(scan_ep * per_epoch / (time.perf_counter() - t0))
    rates.sort()
    prod_sps = rates[len(rates) // 2]

    # --- reference loop shape: per-batch dispatch + per-step loss fetch ---
    state = eng.init(jax.random.key(0))
    state, m = eng.train_step_at(state, idx_mat[0])     # compile
    float(m.elbo)
    times = []
    for i in range(ref_steps):
        t0 = time.perf_counter()
        state, m = eng.train_step_at(state, idx_mat[i % per_epoch])
        float(m.elbo)                                   # sess.run fetch parity
        times.append(time.perf_counter() - t0)
    ref_sps = 1.0 / float(np.median(times))
    out = {
        "metric": "lv_learn_theta_elbo_grad_steps_per_sec_per_chip",
        "value": round(prod_sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(prod_sps / ref_sps, 3),
        "baseline_steps_per_sec": round(ref_sps, 3),
        "config": f"p={p_val}, kext={eng.spec.kernel_ext}, "
                  f"{num_series} series, aligned+stacked+bf16, "
                  f"multi-epoch-scanned ({scan_ep} epochs = "
                  f"{scan_ep * per_epoch} steps/dispatch)",
        "baseline_loop_shape": "per-batch dispatch + per-step loss fetch "
                               "(..._learn_theta.py:623-707 tf.data loop)",
    }
    from viforssms_tpu.utils.roofline import mfu_fields

    out.update(mfu_fields(prod, prod_sps))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan-epochs", type=int, default=128,
                    help="epochs per scanned dispatch (timing loop runs 4 dispatches)")
    ap.add_argument("--num-series", type=int, default=256)
    ap.add_argument("--p", type=int, default=128)
    args = ap.parse_args(argv)

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    r = measure(num_series=args.num_series, p_val=args.p,
                scan_epochs=args.scan_epochs)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
