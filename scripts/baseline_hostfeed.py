"""Measured reference-baseline: the TF1 host-feed training-loop SHAPE on this
hardware.

The reference publishes no benchmark numbers (BASELINE.md), and TF 1.8 is not
installable here, so ``bench.py``'s ``vs_baseline`` needs a MEASURED stand-in
rather than a nominal estimate. This script reproduces the reference loop's
structure exactly (``lotka_volterra_partial.py:359-404``) at the LV-partial
config, with our flow/ELBO math as the device program:

  per step ON THE HOST (Python/NumPy, as the reference does every step):
    - sample ``batch_select`` window starts                        (:360-361)
    - per feature channel, re-slice a Python list of windows and
      ``np.concatenate`` them into the feed tensors                (:366-379)
    - gather mask/shift/bin feeds the same way                     (:381-386)
  then ONE dispatch per step with the feeds as arguments (host->device
  transfer), returning the scalar loss to the host (device->host transfer) —
  the reference's ``sess.run(fetches, feed_dict)``                 (:403-404).

This is the loop our compiled engine replaces (on-device window gather +
2000-step scanned chunks, zero per-step host work). The measured number is
cached in ``BASELINE_MEASURED.json`` (bench.py reads it; rerun this script to
refresh on new hardware).

Run:  python scripts/baseline_hostfeed.py [--steps 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BASELINE_MEASURED.json")


def build_fed_step(eng):
    """One jitted train step taking the gathered feeds as ARGUMENTS (so every
    step pays the host->device transfer, like feed_dict did)."""
    import jax
    import jax.numpy as jnp
    import optax

    from viforssms_tpu.data.features import WindowBatch
    from viforssms_tpu.inference.vi.elbo import compute_elbo

    p = eng.cfg.p

    @jax.jit
    def step(params, opt_state, key, feats, mask, shift, bin_feed):
        def loss_fn(params):
            def flow_apply(z, f, th):
                return eng.flow.apply(params["flow"], z, f, th)

            def theta_sample(k):
                return eng.theta_flow.apply(
                    params["theta"], k, p,
                    method=type(eng.theta_flow).sample_and_log_prob,
                )

            batch = WindowBatch(feats, mask, shift, bin_feed, None)
            t = compute_elbo(
                eng.model, flow_apply, theta_sample, key, eng.tables, eng.spec,
                jnp.zeros((p,), jnp.int32), eng.cfg.elbo_scale,
                gather_fn=lambda _t, _s, _st: batch,
            )
            elbo = jnp.where(jnp.isnan(t.elbo), 0.0, t.elbo)  # nan-mask parity
            return -jnp.mean(elbo)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = eng.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def measure(steps: int = 40, warmup: int = 5, seed: int = 0) -> dict:
    import jax

    from __graft_entry__ import _lv_engine

    # transposed feature mode + f32: the reference-parity configuration
    # (the TF1 script has no aligned mode and TF1.8-era math is f32)
    eng = _lv_engine(target=500, batch_dims=50, p=50, kernel_len=20, no_flows=3,
                     net=(50,) * 5, feat_window=10, aligned=False)
    spec, cfg = eng.spec, eng.cfg
    d, ke, b = spec.flow_dims, spec.kernel_ext, spec.batch_dims

    # Host-side stores, one Python-held array per feature channel — the
    # reference keeps obs_pad_store as a LIST of per-lag arrays and re-slices
    # each per step (lotka_volterra_partial.py:366-379).
    feat_np = np.asarray(eng.tables.feat)            # (L, F)
    channel_store = [np.ascontiguousarray(feat_np[:, c]) for c in range(feat_np.shape[1])]
    mask_np = np.asarray(eng.tables.mask)            # (d, W+1)
    shift_np = np.asarray(eng.tables.shift)
    bin_np = np.asarray(eng.tables.bin_feed)         # (d, W)

    replace = b * cfg.p >= spec.target_dims
    rng = np.random.RandomState(seed)

    def assemble():
        batch_select = rng.choice(
            np.arange(0, spec.target_dims, b), size=cfg.p, replace=replace)
        chans = []
        for item in channel_store:                                   # :366-370
            chans.append(np.concatenate(
                [np.reshape(item[d * idx: d * idx + ke], [1, -1, 1])
                 for idx in batch_select], axis=0))
        time_feats = np.concatenate(chans, axis=2)                   # :378-379
        mask_feed = np.concatenate(
            [np.expand_dims(mask_np[:, idx:idx + b + 1], 0)
             for idx in batch_select], axis=0)                       # :381-382
        shift_feed = np.concatenate(
            [np.expand_dims(shift_np[:, idx:idx + b + 1], 0)
             for idx in batch_select], axis=0)                       # :383-384
        bin_feed = np.concatenate(
            [np.expand_dims(bin_np[:, idx:idx + b], 0)
             for idx in batch_select], 0)                            # :385-386
        return time_feats.astype(np.float32), mask_feed, shift_feed, bin_feed

    step = build_fed_step(eng)
    state = eng.init(jax.random.key(seed))
    params, opt_state = state.params, state.opt_state
    keys = np.asarray(jax.random.key_data(
        jax.random.split(jax.random.key(seed + 1), warmup + steps)))

    for i in range(warmup):
        f, m, s, bn = assemble()
        params, opt_state, loss = step(
            params, opt_state, jax.random.wrap_key_data(jax.numpy.asarray(keys[i])),
            f, m, s, bn)
        float(loss)

    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        f, m, s, bn = assemble()
        params, opt_state, loss = step(
            params, opt_state,
            jax.random.wrap_key_data(jax.numpy.asarray(keys[warmup + i])),
            f, m, s, bn)
        float(loss)  # host read: the reference fetches loss+summary every step
        times.append(time.perf_counter() - t0)

    med = float(np.median(times))
    result = {
        "metric": "lv_partial_hostfeed_steps_per_sec",
        "steps_per_sec": round(1.0 / med, 3),
        "median_step_ms": round(1e3 * med, 3),
        "steps_measured": steps,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "loop_shape": "per-step NumPy feature assembly + fed single-step "
                      "dispatch + scalar fetch (lotka_volterra_partial.py:359-404)",
    }
    return result


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args(argv)

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    r = measure(steps=args.steps)
    print(json.dumps(r))
    if not args.no_cache:
        with open(CACHE, "w") as f:
            json.dump(r, f, indent=1)
        print(f"cached -> {CACHE}", file=sys.stderr)


if __name__ == "__main__":
    main()
