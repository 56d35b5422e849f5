"""Timing study: causal-conv lowering x feature mode on the LV-partial bench config.

Measures the full jitted train step (250-step scanned chunks, bf16 MXU passes)
for {transposed, aligned} x {conv, im2col} on the real chip. See
docs/RESULTS.md "conv lowering study" for recorded numbers.

Usage: python scripts/conv_mode_study.py [--chunk 250]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()

    from __graft_entry__ import _lv_engine

    results = {}
    for aligned in (False, True):
        for conv_mode in ("conv", "im2col"):
            eng = _lv_engine(
                target=500, batch_dims=50, p=50, kernel_len=20, no_flows=3,
                net=(50,) * 5, feat_window=10, matmul_precision="bfloat16",
                aligned=aligned, conv_mode=conv_mode,
            )
            state = eng.init(jax.random.key(0))
            state, metrics = eng.train_many(state, args.chunk)
            float(metrics.elbo[-1])  # completion fence
            rates = []
            for i in range(args.repeats):
                t0 = time.perf_counter()
                state, metrics = eng.train_many(state, args.chunk)
                float(metrics.elbo[-1])
                if i > 0:
                    rates.append(args.chunk / (time.perf_counter() - t0))
            rates.sort()
            med = rates[len(rates) // 2]
            name = f"{'aligned' if aligned else 'transposed'}/{conv_mode}"
            results[name] = med
            print(f"{name:24s} {med:8.1f} steps/s   ({1e3 / med:.3f} ms/step)")

    best = max(results, key=results.get)
    print(f"\nbest: {best} at {results[best]:.1f} steps/s")


if __name__ == "__main__":
    main()
