"""FHN study: windowed vs FULL-PATH (sequence-engine) variational training.

Same protocol as ``sv_fullpath_study.py`` at the FHN validation config
(T=200 time units = 2000 latent steps, ``fitz_nag_NVP.py:453-468``
geometry): the full-path engine WARM-STARTS from the converged windowed
checkpoint (``SequenceVIEngine.from_windowed`` — params drop in) and
fine-tunes exact full-path gradients, so any posterior movement vs the SAME
cached joint-NUTS gold isolates what the batch_dims=50 window subsampling
(a T/batch_dims = 40x ELBO rescaling) costs. ``--iw-k K`` additionally
switches the fine-tune to the IWAE bound over full-path importance weights.

Writes validation/fhn_fullpath.json.

Run on the TPU:  python scripts/fhn_fullpath_study.py [--steps 4000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from validate_baseline import (  # noqa: E402
    VAL_DIR,
    _path_block,
    _theta_block,
    _vi_paths_batched,
)


def _load_gold():
    cands = sorted(glob.glob(os.path.join(VAL_DIR, "fhn",
                                          "gold_joint_nuts*.npz")),
                   key=os.path.getmtime)  # newest gold (review r4)
    assert cands, "run validate_baseline.py fhn first"
    with np.load(cands[-1]) as z:
        return z["gold"], os.path.basename(cands[-1])     # (n, C, 5+2T)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4_000)
    ap.add_argument("--iw-k", type=int, default=0)
    ap.add_argument("--objective", default="elbo",
                    choices=("elbo", "iwae", "dreg", "rws"))
    ap.add_argument("--inner-m", type=int, default=1)
    ap.add_argument("--theta-widen", type=float, default=1.0)
    ap.add_argument("--rws-clip", type=float, default=0.0)
    ap.add_argument("--rws-target-sd", type=float, default=0.0)
    ap.add_argument("--p", type=int, default=0,
                    help="override particle count for the fine-tune")
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("--tag", default="fhn_fullpath",
                    help="output config dir / json name")
    ap.add_argument("--warm-ckpt", default=None,
                    help="warm-start from a FULL-PATH TrainState checkpoint "
                         "dir (e.g. a previous fine-tune) instead of the "
                         "windowed validation/fhn/ckpt")
    args = ap.parse_args()

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import jax

    from viforssms_tpu.cli.experiments import build_fitz_nag
    from viforssms_tpu.inference.vi.sequence_train import SequenceVIEngine
    from viforssms_tpu.utils.checkpoint import Checkpointer

    gold, gold_file = _load_gold()

    weng, info = build_fitz_nag(synthetic=True, T=200.0)
    overrides = {"iw_k": args.iw_k, "objective": args.objective,
                 "inner_m": args.inner_m, "theta_widen": args.theta_widen,
                 "rws_clip": args.rws_clip,
                 "rws_target_sd": args.rws_target_sd}
    if args.p:
        import dataclasses

        overrides["cfg"] = dataclasses.replace(weng.cfg, p=args.p)
    eng = SequenceVIEngine.from_windowed(weng, **overrides)
    cfg_dir = os.path.join(VAL_DIR, args.tag)
    os.makedirs(cfg_dir, exist_ok=True)
    ckpt = Checkpointer(os.path.join(cfg_dir, "ckpt"))
    meta_path = os.path.join(cfg_dir, "fit_meta.json")
    state = eng.init(jax.random.key(1))
    restored = ckpt.restore(state)
    t0 = time.time()
    if restored is not None and int(restored.step) > 0:
        state = restored
        fit_done = int(restored.step)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                fit_done = int(json.load(f)["fit_steps"])
        deficit = args.steps - fit_done
        print(f"restored at step {int(state.step)} (fit steps {fit_done})",
              flush=True)
    else:
        fit_done, deficit = 0, args.steps
        if args.cold:
            state = eng.pretrain(state, num_steps=1000, finite_gate=1000,
                                 scan_chunk=50)
        elif args.warm_ckpt:
            wstate = Checkpointer(args.warm_ckpt).restore(
                eng.init(jax.random.key(2)))
            assert wstate is not None and int(wstate.step) > 0, args.warm_ckpt
            print(f"warm start from full-path ckpt step {int(wstate.step)}",
                  flush=True)
            state = state._replace(params=wstate.params,
                                   opt_state=eng.opt.init(wstate.params))
        else:
            wstate = Checkpointer(os.path.join(VAL_DIR, "fhn", "ckpt")).restore(
                weng.init(jax.random.key(2)))
            assert wstate is not None and int(wstate.step) > 0, (
                "no converged windowed checkpoint under validation/fhn/ckpt")
            print(f"warm start from windowed step {int(wstate.step)}",
                  flush=True)
            state = state._replace(params=wstate.params,
                                   opt_state=eng.opt.init(wstate.params))
    chunk = 200
    while deficit > 0:
        n = min(chunk, deficit)
        tc = time.time()
        state, m = eng.fit(state, num_steps=n, scan_chunk=50)
        deficit -= n
        fit_done += n
        print(f"  fit {fit_done}/{args.steps}: elbo {float(m.elbo):.6g} "
              f"({n / (time.time() - tc):.2f} steps/s)", flush=True)
        ckpt.save(state)
        with open(meta_path, "w") as f:
            json.dump({"fit_steps": fit_done}, f)
    wall = time.time() - t0
    print(f"full-path FHN ready in {wall:.0f}s", flush=True)

    names = ("log_eps", "alpha", "beta", "log_s1", "log_s2")
    vi_theta = eng.sample_theta(state.params, jax.random.key(52), 20_000)
    theta = _theta_block(vi_theta, gold[:, :, :5], names)
    vi_paths = _vi_paths_batched(eng, state.params, jax.random.key(53), 6)
    paths = _path_block(vi_paths.reshape(vi_paths.shape[0], -1),
                        gold[:, :, 5:])

    elbo, se = eng.estimate_elbo(state.params, jax.random.key(45), 10)
    out = {
        "config": args.tag,
        "gold_standard": f"same cached joint NUTS as validation/fhn.json "
                         f"({gold_file})",
        "protocol": (("cold" if args.cold else
                      f"warm start from "
                      f"{args.warm_ckpt or 'converged windowed checkpoint'} + "
                      f"exact full-path fine-tune")
                     + (f", IWAE k={args.iw_k}" if args.iw_k > 1 else "")
                     + (f", objective={args.objective}"
                        if args.objective != "elbo" else "")
                     + (f", inner_m={args.inner_m}"
                        if args.inner_m > 1 else "")
                     + (f", theta_widen={args.theta_widen}"
                        if args.theta_widen != 1.0 else "")
                     + (f", rws_clip={args.rws_clip}"
                        if args.rws_clip else "")
                     + (f", rws_target_sd={args.rws_target_sd}"
                        if args.rws_target_sd else "")),
        "vi_steps": args.steps,
        "elbo_fullpath": [elbo, se],
        "theta": theta,
        "paths": paths,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(VAL_DIR, f"{args.tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"saved validation/{args.tag}.json", flush=True)
    for i, nm in enumerate(names):
        print(f"{nm}: vi {theta['vi_mean'][i]:.3f}±{theta['vi_sd'][i]:.3f} "
              f"gold {theta['gold_mean'][i]:.3f}±{theta['gold_sd'][i]:.3f} "
              f"bias/sd {theta['bias_in_posterior_sd'][i]:.2f}", flush=True)


if __name__ == "__main__":
    main()
