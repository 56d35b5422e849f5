"""Learn-theta MFU study (round 5, VERDICT r4 item 6).

The production learn-theta path measured 668 steps/s = 17% bf16 MFU with
HBM at ~34% (BENCH_r04, roofline): compute/bandwidth mixed. This script
measures the candidate single-chip levers one at a time on the production
shape (p=128, kext=364, 256 series, aligned+stacked, 128-epoch scans):

  * ``compute_dtype=bfloat16`` — bf16 activations through the conv/tower
    (halves activation HBM traffic; measured no-op at LV-partial shapes,
    docs/RESULTS.md, but this shape is bandwidth-mixed);
  * bf16-resident feature tables — halves the stacked-gather read traffic;
  * ``batched_feat_mlp`` — all flows' pointwise feature nets in one
    flow-batched einsum chain;
  * ``prng_impl=rbg`` — hardware PRNG instead of threefry key chains;
  * combinations of the winners.

Each variant reports steps/s + bf16 MFU. Writes validation/mfu_study.json.

Run (chip):  python scripts/learn_theta_mfu_study.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VAL_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "validation")


def _measure(eng, num_series, p_val, scan_ep=128, reps=4):
    import jax

    per_epoch = num_series // p_val
    idx_mat = np.stack([
        np.arange(i, i + p_val, dtype=np.int32)
        for i in range(0, num_series - p_val + 1, p_val)
    ])
    state = eng.init(jax.random.key(0))
    state, _, ms = eng.train_epochs(state, idx_mat, scan_ep)
    elbo = float(ms.elbo)
    rates = []
    for i in range(reps):
        t0 = time.perf_counter()
        state, _, ms = eng.train_epochs(state, idx_mat, scan_ep)
        elbo = float(ms.elbo)
        if i > 0:
            rates.append(scan_ep * per_epoch / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2], elbo


def main():
    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import jax.numpy as jnp

    from viforssms_tpu.cli.experiments import build_lv_learn_theta
    from viforssms_tpu.utils.roofline import mfu_fields

    num_series, p_val = 256, 128
    base, _ = build_lv_learn_theta(synthetic=True, num_series=num_series,
                                   p_val=p_val)

    def variant(name, **over):
        flow_over = {k: over.pop(k) for k in
                     ("compute_dtype", "batched_feat_mlp") if k in over}
        eng = base
        if flow_over:
            eng = dataclasses.replace(
                eng, cfg=dataclasses.replace(
                    eng.cfg, flow=dataclasses.replace(eng.cfg.flow,
                                                      **flow_over)))
        bf16_tables = over.pop("bf16_tables", False)
        eng = dataclasses.replace(eng, matmul_precision="bfloat16", **over)
        if bf16_tables:
            # NOTE: y is extracted from the lag-0 feature channel, so bf16
            # tables also quantize the observations (~1 unit at populations
            # ~300) — elbo_after flags any quality drift
            eng.tables = eng.tables._replace(
                feat=eng.tables.feat.astype(jnp.bfloat16))
        sps, elbo = _measure(eng, num_series, p_val)
        rec = {"steps_per_sec": round(sps, 1), "elbo_after": elbo}
        rec.update(mfu_fields(eng, sps))
        print(f"{name}: {sps:.1f} steps/s, mfu_bf16 "
              f"{rec.get('mfu_bf16')}", flush=True)
        return rec

    out = {"config": "p=128, kext=364, 256 series, aligned+stacked, "
                     "128-epoch scans, bf16 matmul"}
    out["base"] = variant("base")
    out["bf16_act"] = variant("bf16_act", compute_dtype="bfloat16")
    out["bf16_tables"] = variant("bf16_tables", bf16_tables=True)
    out["batched_feat_mlp"] = variant("batched_feat_mlp",
                                      batched_feat_mlp=True)
    out["rbg"] = variant("rbg", prng_impl="rbg")
    # combine everything that did not lose throughput
    best = {"compute_dtype": "bfloat16"} \
        if out["bf16_act"]["steps_per_sec"] >= out["base"]["steps_per_sec"] \
        else {}
    combo_kw = dict(best)
    if out["bf16_tables"]["steps_per_sec"] >= out["base"]["steps_per_sec"]:
        combo_kw["bf16_tables"] = True
    if out["batched_feat_mlp"]["steps_per_sec"] >= out["base"]["steps_per_sec"]:
        combo_kw["batched_feat_mlp"] = True
    if out["rbg"]["steps_per_sec"] >= out["base"]["steps_per_sec"]:
        combo_kw["prng_impl"] = "rbg"
    out["combo"] = variant(f"combo {sorted(combo_kw)}", **combo_kw)
    out["combo_kw"] = sorted(combo_kw)
    out["timestamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(VAL_DIR, "mfu_study.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("saved validation/mfu_study.json", flush=True)


if __name__ == "__main__":
    main()
