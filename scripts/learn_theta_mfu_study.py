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

    # --- wider-batch packing (VERDICT r4 item 6 "larger series batch per
    # step"): p=256 fuses TWO reference batches into one step. mfu_fields
    # counts FLOPs at the packed p, so mfu_bf16 is directly comparable;
    # ref-step equivalents = steps/s * (p/128).
    packed_series, packed_p = 512, 256
    pbase, _ = build_lv_learn_theta(synthetic=True,
                                    num_series=packed_series,
                                    p_val=packed_p)
    peng = dataclasses.replace(
        pbase, matmul_precision="bfloat16",
        cfg=dataclasses.replace(
            pbase.cfg, flow=dataclasses.replace(
                pbase.cfg.flow, compute_dtype="bfloat16")))
    sps, elbo = _measure(peng, packed_series, packed_p)
    rec = {"steps_per_sec": round(sps, 1),
           "ref_step_equivalents_per_sec": round(sps * packed_p / 128, 1),
           "elbo_after": elbo}
    rec.update(mfu_fields(peng, sps))
    print(f"packed p={packed_p}: {sps:.1f} steps/s "
          f"({rec['ref_step_equivalents_per_sec']} ref-step-equiv/s), "
          f"mfu_bf16 {rec.get('mfu_bf16')}", flush=True)
    out["packed_p256"] = rec

    # --- measured step breakdown at the winning config (bf16 activations):
    # forward-only loss vs forward+backward(+grad norm) vs the full
    # production step. Attributes the 100%-MFU gap to fwd / bwd / update
    # phases with on-device scans (no dispatch noise).
    import jax
    import jax.numpy as jnp

    weng = dataclasses.replace(
        base, matmul_precision="bfloat16",
        cfg=dataclasses.replace(
            base.cfg, flow=dataclasses.replace(base.cfg.flow,
                                               compute_dtype="bfloat16")))
    idx = jnp.asarray(np.stack([
        np.arange(i, i + p_val, dtype=np.int32)
        for i in range(0, num_series - p_val + 1, p_val)
    ]))
    n_rows = idx.shape[0]
    state = weng.init(jax.random.key(0))
    params = state.params
    scan_steps = 256

    def timed(fn_step, tag):
        @jax.jit
        def many(params, key):
            def body(c, _):
                k, i = c
                k1, k2 = jax.random.split(k)
                v = fn_step(params, k1, idx[i % n_rows])
                return (k2, i + 1), v
            (_, _), vs = jax.lax.scan(body, (key, jnp.int32(0)), None,
                                      length=scan_steps)
            return vs[-1]
        float(many(params, jax.random.key(1)))          # compile + warm
        rates = []
        for i in range(4):
            t0 = time.perf_counter()
            float(many(params, jax.random.key(2 + i)))  # host-read fence
            if i > 0:
                rates.append(scan_steps / (time.perf_counter() - t0))
        rates.sort()
        r = rates[len(rates) // 2]
        print(f"breakdown/{tag}: {r:.1f} evals/s", flush=True)
        return r

    def prec(f):
        if weng.matmul_precision is None:
            return f
        def g(*a):
            with jax.default_matmul_precision(weng.matmul_precision):
                return f(*a)
        return g

    fwd_rate = timed(prec(lambda p, k, s: weng._loss(p, k, s)[0]), "fwd")
    import optax

    def fwd_bwd(p, k, s):
        g = jax.grad(lambda pp: weng._loss(pp, k, s)[0])(p)
        return optax.global_norm(g)                     # consumed like the clip

    fb_rate = timed(prec(fwd_bwd), "fwd+bwd+norm")
    full_rate = out.get("bf16_act", out["base"])["steps_per_sec"]
    t_fwd, t_fb, t_full = 1e3 / fwd_rate, 1e3 / fb_rate, 1e3 / full_rate
    from viforssms_tpu.utils.roofline import device_peak, engine_step_flops

    fwd_flops = engine_step_flops(weng) / 3             # fwd is 1/3 of total
    pk = (device_peak(jax.devices()[0]) or {}).get("bf16_tflops", 197.0)
    out["breakdown"] = {
        "config": "bf16 activations, on-device 256-step scans",
        "fwd_evals_per_sec": round(fwd_rate, 1),
        "fwd_bwd_norm_evals_per_sec": round(fb_rate, 1),
        "full_step_per_sec": full_rate,
        "ms_fwd": round(t_fwd, 3),
        "ms_bwd": round(t_fb - t_fwd, 3),
        "ms_update_and_epoch_overhead": round(t_full - t_fb, 3),
        "ms_full": round(t_full, 3),
        "fwd_mfu_bf16": round(
            100 * fwd_flops * fwd_rate / 1e12 / pk, 2),
        "bwd_mfu_bf16": round(
            100 * 2 * fwd_flops / 1e12 / max(t_fb - t_fwd, 1e-9) * 1e3
            / pk, 2),
    }
    out["timestamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(VAL_DIR, "mfu_study.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("saved validation/mfu_study.json", flush=True)


if __name__ == "__main__":
    main()
