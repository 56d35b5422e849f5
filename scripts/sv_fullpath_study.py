"""SV study: windowed vs FULL-PATH (sequence-engine) variational training.

The windowed engine trains on batch_dims=52 sub-windows with a 29x ELBO
rescaling (``SV_dense.py:404-418`` semantics); the sequence engine optimizes
the exact full-path ELBO of the whole 1508-step series
(``inference/vi/sequence_train.SequenceVIEngine``). Both share the same flow
family and model, so comparing their posteriors against the SAME cached
joint-NUTS gold standard isolates what the window subsampling costs.

Design (round 3): a full-path step costs ~T/batch_dims = 29x a windowed
step, so a cold 20k-step run is ~6 h on one chip. Instead the full-path
engine WARM-STARTS from the converged windowed checkpoint (params are
drop-in compatible, ``SequenceVIEngine.from_windowed``) and fine-tunes a
few thousand exact-gradient steps: any posterior movement is then
attributable to removing the window subsampling, the family being held
fixed. ``--cold`` recovers the from-scratch protocol.

Requires the windowed fit + joint-NUTS gold under validation/sv (produced by
``scripts/validate_baseline.py sv``). Writes validation/sv_fullpath.json.

Run on the TPU:  python scripts/sv_fullpath_study.py [--steps 4000]
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
    _dat_dir,
    _path_block,
    _theta_block,
    _vi_paths_batched,
)


def _load_gold():
    cands = sorted(glob.glob(os.path.join(VAL_DIR, "sv",
                                          "gold_joint_nuts*.npz")),
                   key=os.path.getmtime)  # newest gold (review r4)
    assert cands, "run validate_baseline.py sv first"
    with np.load(cands[-1]) as z:
        return z["gold"], os.path.basename(cands[-1])      # (n, C, 4+T)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4_000)
    ap.add_argument("--pretrain", type=int, default=1_000,
                    help="cold-start only")
    ap.add_argument("--cold", action="store_true",
                    help="train from scratch instead of warm-starting from "
                         "the windowed checkpoint")
    ap.add_argument("--windowed-steps", type=int, default=0,
                    help="cold protocol: first train the (possibly widened) "
                         "family WINDOWED for this many steps — the stable "
                         "regime (badness localizes to one window) — then "
                         "warm-start the full-path fine-tune from it")
    ap.add_argument("--p", type=int, default=0,
                    help="override particle count for the fine-tune")
    ap.add_argument("--iw-k", type=int, default=0,
                    help="fine-tune the IWAE bound over full-path weights")
    ap.add_argument("--objective", default="elbo",
                    choices=("elbo", "iwae", "dreg", "rws"),
                    help="training objective (round 4): dreg = "
                         "doubly-reparameterized IWAE gradients, rws = "
                         "forward-KL wake-phase theta update")
    ap.add_argument("--inner-m", type=int, default=1,
                    help="path draws per theta (marginalized theta weights)")
    ap.add_argument("--theta-widen", type=float, default=1.0,
                    help="rws proposal base-scale inflation")
    ap.add_argument("--rws-clip", type=float, default=0.0,
                    help="rws truncated-weight cap (x mean weight; 0=off)")
    ap.add_argument("--rws-target-sd", type=float, default=0.0,
                    help="rws adaptive weight tempering: target sd of the "
                         "tempered log-weights (0=off)")
    ap.add_argument("--no-flows", type=int, default=0,
                    help="override flow count (family-capacity study; "
                         "forces --cold: params no longer match)")
    ap.add_argument("--net-width", type=int, default=0,
                    help="override conv-tower width (family-capacity study)")
    ap.add_argument("--tag", default="sv_fullpath",
                    help="output config dir / json name")
    ap.add_argument("--warm-ckpt", default=None,
                    help="warm-start checkpoint dir holding a FULL-PATH "
                         "TrainState (e.g. validation/sv_fullpath/ckpt); "
                         "default warm-starts from the windowed "
                         "validation/sv/ckpt")
    args = ap.parse_args()

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import dataclasses

    import jax

    from viforssms_tpu.cli.experiments import build_sv_dense
    from viforssms_tpu.inference.vi.sequence_train import SequenceVIEngine
    from viforssms_tpu.utils.checkpoint import Checkpointer

    gold, gold_file = _load_gold()

    builder_kw = {}
    if args.no_flows:
        builder_kw["no_flows"] = args.no_flows
    if args.net_width:
        builder_kw["net_width"] = args.net_width
    if builder_kw and not args.warm_ckpt:
        args.cold = True  # widened family: windowed params no longer fit
    weng, info = build_sv_dense(sv_file=os.path.join(_dat_dir(), "SV.dat"),
                                **builder_kw)
    overrides = {"iw_k": args.iw_k, "objective": args.objective,
                 "inner_m": args.inner_m, "theta_widen": args.theta_widen,
                 "rws_clip": args.rws_clip,
                 "rws_target_sd": args.rws_target_sd}
    cfg = weng.cfg
    if args.p:
        cfg = dataclasses.replace(cfg, p=args.p)
    if args.cold or (builder_kw and args.warm_ckpt):
        # (also for wide warm-starts: the saved wide checkpoint was written
        # with the wrapped optimizer state, so the restore template must
        # match — and the guards cost nothing on a sane trajectory)
        # cold training of a widened family transits unstable regions:
        # mask non-finite particles in the loss (..._learn_theta.py:482)
        # AND skip updates whose gradients are non-finite (a FINITE-but-
        # extreme ELBO can still overflow in the backward pass; the
        # global-norm clip then NaNs every parameter in one step —
        # measured, r3). Applied to BOTH stages: the windowed wide stage
        # NaN'd at 60k steps without it.
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, nan_mask_loss=True),
            # near-identity init: a deep/wide lecun-init stack compounds to
            # |x| ~ 200 paths at init (measured) — unrecoverable densities
            flow=dataclasses.replace(cfg.flow, out_init_zero=True))
        overrides["skip_nonfinite_updates"] = True
        weng = dataclasses.replace(weng, cfg=cfg,
                                   skip_nonfinite_updates=True)
    if cfg is not weng.cfg:
        overrides["cfg"] = cfg
    eng = SequenceVIEngine.from_windowed(weng, **overrides)  # 1x1 mesh
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
        if args.cold and args.windowed_steps:
            # stable cold protocol: windowed training first (one bad window
            # cannot -inf a whole-path particle), then warm-start full-path
            wdir = os.path.join(cfg_dir, "windowed_ckpt")
            wckpt = Checkpointer(wdir)
            wstate = weng.init(jax.random.key(2))
            restored_w = wckpt.restore(wstate)
            if restored_w is not None and int(restored_w.step) > 0:
                wstate = restored_w
                print(f"windowed stage restored at step {int(wstate.step)}",
                      flush=True)
            else:
                t0w = time.time()
                wstate = weng.pretrain(wstate, num_steps=args.pretrain,
                                       scan_chunk=50)
                wstate, wm = weng.fit(wstate, num_steps=args.windowed_steps,
                                      scan_chunk=500)
                wckpt.save(wstate)
                print(f"windowed stage: {args.windowed_steps} steps in "
                      f"{time.time() - t0w:.0f}s, elbo {float(wm.elbo):.4g}",
                      flush=True)
            state = state._replace(params=wstate.params,
                                   opt_state=eng.opt.init(wstate.params))
        elif args.cold:
            state = eng.pretrain(state, num_steps=args.pretrain,
                                 scan_chunk=50)
        elif args.warm_ckpt:
            # warm start from a FULL-PATH TrainState (e.g. a previous
            # fine-tune's checkpoint)
            wstate = Checkpointer(args.warm_ckpt).restore(
                eng.init(jax.random.key(2)))
            assert wstate is not None and int(wstate.step) > 0, args.warm_ckpt
            print(f"warm start from full-path ckpt step {int(wstate.step)}",
                  flush=True)
            state = state._replace(params=wstate.params,
                                   opt_state=eng.opt.init(wstate.params))
        else:
            # warm start: converged windowed params drop into the full-path
            # engine (same flow/theta family); optimizer state restarts
            wstate = Checkpointer(os.path.join(VAL_DIR, "sv", "ckpt")).restore(
                weng.init(jax.random.key(2)))
            assert wstate is not None and int(wstate.step) > 0, (
                "no converged windowed checkpoint under validation/sv/ckpt")
            print(f"warm start from windowed step {int(wstate.step)}",
                  flush=True)
            state = state._replace(params=wstate.params,
                                   opt_state=eng.opt.init(wstate.params))
    chunk = 100
    while deficit > 0:
        n = min(chunk, deficit)
        tc = time.time()
        state, m = eng.fit(state, num_steps=n, scan_chunk=50)
        deficit -= n
        fit_done += n
        print(f"  fit {fit_done}/{args.steps}: elbo {float(m.elbo):.4g} "
              f"({n / (time.time() - tc):.2f} steps/s)", flush=True)
        ckpt.save(state)
        with open(meta_path, "w") as f:
            json.dump({"fit_steps": fit_done}, f)
    wall = time.time() - t0
    print(f"full-path SV ready in {wall:.0f}s", flush=True)

    vi_theta = eng.sample_theta(state.params, jax.random.key(42), 20_000)
    theta = _theta_block(vi_theta, gold[:, :, :4],
                         ("t0_drift", "t1_mean", "t2_rate", "t3_vol"))
    vi_lat = _vi_paths_batched(eng, state.params, jax.random.key(44), 6)[:, 1, :]
    paths = _path_block(vi_lat, gold[:, :, 4:])

    # PSIS-SNIS debiasing: q is the (IWAE-trained) proposal; the weighted
    # mixture is the posterior estimate (consistent even where q is biased,
    # k-hat permitting)
    from viforssms_tpu.inference.quality import snis_moments

    th_d, x_d, lw = eng.importance_draws(state.params, jax.random.key(46),
                                         num_batches=20)
    sm, ssd, sse, ps = snis_moments(th_d, lw)
    gflat = gold[:, :, :4].reshape(-1, 4).astype(np.float64)
    gmean, gsd = gflat.mean(0), gflat.std(0) + 1e-12
    lat = x_d[:, 1, :].astype(np.float64)
    w = np.exp(ps.log_weights)
    pmean = w @ lat
    gp = gold[:, :, 4:].reshape(-1, lat.shape[1]).astype(np.float64)
    gpm, gpsd = gp.mean(0), gp.std(0) + 1e-12
    pb = np.abs(pmean - gpm) / gpsd
    snis = {
        "k_hat": float(ps.k_hat), "psis_ess": float(ps.ess),
        "num_draws": int(lw.size),
        "theta_mean": sm.tolist(), "theta_sd": ssd.tolist(),
        "theta_se_mean": sse.tolist(),
        "theta_bias_in_posterior_sd": (np.abs(sm - gmean) / gsd).tolist(),
        "path_bias_sd_median": float(np.median(pb)),
        "path_bias_sd_max": float(np.max(pb)),
    }

    elbo, se = eng.estimate_elbo(state.params, jax.random.key(45), 10)
    out = {
        "config": args.tag,
        "gold_standard": f"same cached joint NUTS as validation/sv.json "
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
        "snis": snis,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(VAL_DIR, f"{args.tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"saved validation/{args.tag}.json", flush=True)
    for i, n in enumerate(theta["names"]):
        print(f"{n}: vi {theta['vi_mean'][i]:.3f}±{theta['vi_sd'][i]:.3f} "
              f"gold {theta['gold_mean'][i]:.3f}±{theta['gold_sd'][i]:.3f} "
              f"bias/sd {theta['bias_in_posterior_sd'][i]:.2f} | snis "
              f"{snis['theta_mean'][i]:.3f} bias/sd "
              f"{snis['theta_bias_in_posterior_sd'][i]:.2f}", flush=True)
    print(f"PSIS k_hat {snis['k_hat']:.3f}, ess {snis['psis_ess']:.0f} "
          f"of {snis['num_draws']}", flush=True)


if __name__ == "__main__":
    main()
