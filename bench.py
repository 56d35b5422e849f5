"""Benchmark: ELBO gradient steps/s on the LV-partial reference configuration.

Runs the FULL jitted training step (window sampling, feature gather, 2-D NMA
flow, bivariate SDE ELBO, gradients, clipped Adamax) at the reference's
LV-partial scale: p=50 particles, kernel_len=20, batch_dims=50, 500 latent
steps, net [50]x5, 3 flows (``lotka_volterra_partial.py:467-477``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is MEASURED, not nominal: ``scripts/baseline_hostfeed.py``
reproduces the reference's host-feed loop shape (per-step NumPy feature
assembly + fed single-step dispatch + scalar fetch,
``lotka_volterra_partial.py:359-404``) on this same device and caches the
result in ``BASELINE_MEASURED.json``. bench.py reuses the cache when it was
taken on the same backend, else re-measures inline (~30 s once).
"""

from __future__ import annotations

import json
import os
import sys
import time


def measured_baseline_steps_per_sec() -> tuple[float, str]:
    """Host-feed baseline on THIS backend: cached measurement or fresh run."""
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "scripts"))
    import baseline_hostfeed

    backend = jax.default_backend()
    if os.path.exists(baseline_hostfeed.CACHE):
        try:
            with open(baseline_hostfeed.CACHE) as f:
                r = json.load(f)
            if r.get("backend") == backend:
                return float(r["steps_per_sec"]), "cached"
        except Exception:
            pass
    r = baseline_hostfeed.measure(steps=30)
    try:
        with open(baseline_hostfeed.CACHE, "w") as f:
            json.dump(r, f, indent=1)
    except OSError:
        pass
    return float(r["steps_per_sec"]), "measured"


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the batched learn-theta bench "
                         "(scripts/bench_learn_theta.py); by default both "
                         "metrics are printed, with the headline LV-partial "
                         "line LAST on stdout for the driver's "
                         "single-line parse")
    ap.add_argument("--all", action="store_true",
                    help="(kept for compatibility; both benches are now the "
                         "default)")
    args = ap.parse_args(argv)

    import jax

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()

    if not args.headline_only:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        try:
            import bench_learn_theta

            print(json.dumps(bench_learn_theta.measure()), flush=True)
        except Exception as e:  # the headline line must still land last
            print(f"learn-theta bench failed: {e!r}", file=sys.stderr)

    from __graft_entry__ import _lv_engine

    # bf16 MXU passes: ~1.3x over f32 with posterior recovery validated to be
    # indistinguishable on the LV benchmark (docs/RESULTS.md). aligned=True is
    # the TPU-fast feature mode — statistically equivalent posterior quality
    # across a six-seed study (docs/RESULTS.md "aligned 2-D feature mode"),
    # 1.19x on this config, and the production-recommended setting.
    eng = _lv_engine(target=500, batch_dims=50, p=50, kernel_len=20, no_flows=3,
                     net=(50,) * 5, feat_window=10, matmul_precision="bfloat16",
                     aligned=True, prng_impl="rbg")
    state = eng.init(jax.random.key(0))

    # compile + warmup: a scanned chunk is ONE device program per call, so the
    # measurement is free of per-step host-dispatch latency over the tunnel.
    # Fence with an actual host read (float(...)): the experimental remote
    # backend's block_until_ready can report readiness early, which would
    # make a chunk appear impossibly fast. Chunk 2000: the tunnel costs
    # ~25 ms of dispatch/queueing per call regardless of chunk length
    # (250-chunks lose ~10% of throughput to it — docs/RESULTS.md).
    chunk = 2000
    state, metrics = eng.train_many(state, chunk)
    float(metrics.elbo[-1])

    rates = []
    for i in range(5):
        t0 = time.perf_counter()
        state, metrics = eng.train_many(state, chunk)
        float(metrics.elbo[-1])  # host read = true completion fence
        if i > 0:  # skip the first post-warmup chunk (readiness anomalies)
            rates.append(chunk / (time.perf_counter() - t0))
    rates.sort()
    single_sps = rates[len(rates) // 2]  # median chunk rate

    # --- replica-packed headline (round 5): R independent reference-config
    # fits advance in ONE program, filling the 128 MXU lanes that a single
    # p=50 replica leaves idle (VERDICT r4 item 4; the reference's
    # seeds-2..5 sweeps are independent replicas). Aggregate steps/s =
    # R * per-replica rate; each replica is EXACTLY the reference step.
    # R=16 measured 1102 steps/s (worse than single; docs/RESULTS.md round-5
    # replica study) — the sweep keeps the two contenders
    best = (single_sps, 1)
    for R in (4, 8):
        states = eng.init_replicated(jax.random.key(1), R)
        rchunk = max(250, chunk // R)
        states, ms = eng.train_many_replicated(states, rchunk)   # compile
        float(ms.elbo[0][-1])
        rrates = []
        for i in range(4):
            t0 = time.perf_counter()
            states, ms = eng.train_many_replicated(states, rchunk)
            float(ms.elbo[0][-1])
            if i > 0:
                rrates.append(R * rchunk / (time.perf_counter() - t0))
        rrates.sort()
        agg = rrates[len(rrates) // 2]
        print(f"replicated R={R}: {agg:.1f} aggregate steps/s", file=sys.stderr)
        if agg > best[0]:
            best = (agg, R)
    steps_per_sec, replicas = best

    baseline, src = measured_baseline_steps_per_sec()
    print(f"host-feed baseline ({src}): {baseline} steps/s", file=sys.stderr)
    rec = {
        "metric": "lv_partial_elbo_grad_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 3),
        "replicas": replicas,
        "single_replica_steps_per_sec": round(single_sps, 3),
    }
    # model-FLOP utilization vs the chip's peak (VERDICT r3 item 5); FLOPs
    # per aggregate step are per-replica FLOPs (each step is one reference
    # step), so mfu_fields scales correctly with the aggregate rate
    from viforssms_tpu.utils.roofline import mfu_fields

    rec.update(mfu_fields(eng, steps_per_sec))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
