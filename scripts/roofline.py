"""Speed-of-light analysis of the production-scale learn-theta train step.

VERDICT round-1 item 10: the p=128, kext=364 batched learn-theta config
(``..._learn_theta.py:787-802``) ran at ~38 steps/s with no roofline
statement. This script:

  1. counts the step's matmul FLOPs and HBM traffic analytically from the
     flow geometry (the conv/dense chain dominates — SURVEY.md §3.5);
  2. measures steps/s on the real chip (scan-chunked, post-compile);
  3. states the bound: achieved FLOP/s vs the chip's peak, achieved bytes/s
     vs HBM bandwidth, plus the XLA-reported cost analysis for the compiled
     program as a cross-check.

Writes one JSON blob to stdout and (optionally) a trace for xprof.

Run on the TPU:  python scripts/roofline.py [--steps 500] [--trace DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# FLOP model + peak table live in the library so bench.py shares them
# (viforssms_tpu/utils/roofline.py, round 4)
from viforssms_tpu.utils.roofline import (  # noqa: E402
    device_peak,
    engine_step_flops,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--num-series", type=int, default=1024)
    ap.add_argument("--p-val", type=int, default=128)
    args = ap.parse_args()

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import jax

    from viforssms_tpu.cli.experiments import build_lv_learn_theta

    import dataclasses

    eng, info = build_lv_learn_theta(synthetic=True,
                                     num_series=args.num_series,
                                     p_val=args.p_val)
    # the PRODUCTION path: bf16 MXU passes + multi-epoch scanned dispatch
    # (round 4 — matches what bench_learn_theta.py measures; the old
    # per-step train_many measurement was dominated by tunnel dispatch)
    eng = dataclasses.replace(eng, matmul_precision="bfloat16")
    cfg = eng.cfg
    state = eng.init(jax.random.key(0))

    per_epoch = args.num_series // args.p_val
    idx_mat = np.stack([
        np.arange(i, i + args.p_val, dtype=np.int32)
        for i in range(0, args.num_series - args.p_val + 1, args.p_val)
    ])
    scan_ep = max(1, args.steps // per_epoch)
    state, _, ms = eng.train_epochs(state, idx_mat, scan_ep)   # compile
    float(ms.elbo)
    n = scan_ep * per_epoch
    t0 = time.time()
    state, _, ms = eng.train_epochs(state, idx_mat, scan_ep)
    float(ms.elbo)                                # completion fence
    dt_run = time.time() - t0
    sps = n / dt_run

    if args.trace:
        with jax.profiler.trace(args.trace):
            state, _, ms = eng.train_epochs(state, idx_mat, 10)
            float(ms.elbo)

    # analytic FLOPs (fwd + dgrad + wgrad), shared with bench.py
    fw = cfg.flow
    spec = eng.spec
    F = int(eng.tables.feat.shape[-1])
    total = engine_step_flops(eng)
    fwd = total // 3
    achieved_tflops = total * sps / 1e12

    # HBM traffic per step (lower bound): feature gathers + activations
    # read/write once per layer per direction
    act_bytes = 4 * cfg.p * spec.kernel_ext * (1 + fw.network_dims[0]) \
        * fw.no_flows * (2 + len(fw.network_dims[1:-1]))
    gather_bytes = 4 * cfg.p * spec.kernel_ext * F
    hbm_gbps = (3 * act_bytes + gather_bytes) * sps / 1e9

    d0 = jax.devices()[0]
    dev = f"{getattr(d0, 'device_kind', '')} {d0}".lower()
    peak = device_peak(d0)
    out = {
        "config": f"lv-learn-theta p={cfg.p} kext={spec.kernel_ext} "
                  f"net={fw.network_dims} series={args.num_series}",
        "steps_per_s": round(sps, 2),
        "analytic_fwd_gflops_per_step": round(fwd / 1e9, 2),
        "analytic_total_gflops_per_step": round(total / 1e9, 2),
        "achieved_tflops": round(achieved_tflops, 2),
        "est_hbm_gbps": round(hbm_gbps, 1),
        "device": dev,
    }
    if peak:
        out["mxu_utilization_f32"] = round(
            100 * achieved_tflops / peak["f32_tflops"], 1)
        out["mxu_utilization_bf16"] = round(
            100 * achieved_tflops / peak["bf16_tflops"], 1)
        out["hbm_utilization_pct"] = round(100 * hbm_gbps / peak["hbm_gbps"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
