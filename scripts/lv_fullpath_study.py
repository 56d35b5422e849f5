"""LV-partial study: windowed vs FULL-PATH (sequence-engine) training.

Round-2 left the lv_partial path story open (VERDICT r2 item 4): the
windowed engine PASSes on median path bias but 83% of path coordinates sit
beyond 2 MC-SE of the pinned-theta path-NUTS gold. The NMA flow family and
model are identical between the windowed engine (batch_dims=50 windows with
a T/batch_dims ELBO rescaling, ``lotka_volterra_partial.py:467-477``) and
the full-path :class:`SequenceVIEngine`; comparing both against the SAME
cached gold isolates what window subsampling costs on the path marginals.

Requires the lv_partial path-NUTS gold cache (produced by
``scripts/validate_baseline.py lv-partial``). Writes
validation/lv_fullpath.json, which ``validate_baseline.py lv-partial``'s
notes section reads to state the diagnosis.

Run on the TPU:  python scripts/lv_fullpath_study.py [--steps 20000]
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
    _vi_paths_batched,
)


def _load_gold_u():
    """The cached path-NUTS gold draws (keyed or legacy filename); newest
    cache wins so the study always judges against the gold validate uses."""
    cands = sorted(glob.glob(os.path.join(VAL_DIR, "lv_partial",
                                          "gold_path_nuts*.npz")),
                   key=os.path.getmtime)
    assert cands, "run validate_baseline.py lv-partial first"
    with np.load(cands[-1]) as z:
        return z["u"], os.path.basename(cands[-1])        # (n, C, 2T)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20_000)
    ap.add_argument("--pretrain", type=int, default=1_000)
    ap.add_argument("--iw-k", type=int, default=1,
                    help="IWAE bound over full-path importance weights "
                         "(k>1 trains a tighter path posterior; own stage "
                         "dir lv_fullpath_iw<k>, warm-started from the "
                         "plain full-path checkpoint)")
    ap.add_argument("--no-flows", type=int, default=None,
                    help="capacity override: number of conv flows "
                         "(reference 3); any override trains a fresh "
                         "lv_fullpath_cap stage")
    ap.add_argument("--kernel-len", type=int, default=None,
                    help="capacity override: conv kernel length (ref 20)")
    ap.add_argument("--net-width", type=int, default=None,
                    help="capacity override: conv tower width (ref 50)")
    ap.add_argument("--mean-offset", action="store_true",
                    help="learned per-coordinate mean offset in the raw "
                         "path space (round-5 family extension; the "
                         "translation probe measured the exact ELBO "
                         "preferring the gold-shifted mean — "
                         "scripts/lv_path_floor.py). Stage dir "
                         "lv_fullpath_off")
    ap.add_argument("--offset-scale", type=float, default=1.0,
                    help="update-scale boost for the mean offset (its ELBO "
                         "signal is nats over 2T coords — too flat for the "
                         "shared 1e-3 step). Stage dir lv_fullpath_off2, "
                         "warm-started from lv_fullpath_off")
    args = ap.parse_args()

    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from viforssms_tpu.cli.experiments import build_lv_partial
    from viforssms_tpu.distributions.bijectors import Softplus
    from viforssms_tpu.inference.vi.sequence_train import SequenceVIEngine
    from viforssms_tpu.utils.checkpoint import Checkpointer

    gold_u, gold_file = _load_gold_u()
    gold_paths = np.asarray(Softplus().forward(jnp.asarray(gold_u)))

    weng, info = build_lv_partial(dat_dir=_dat_dir())
    cap = any(v is not None for v in (args.no_flows, args.kernel_len,
                                      args.net_width))
    if cap:
        # capacity-boosted variational family for the PRODUCTION path
        # posterior (the reference-parity family floor sits at path bias/sd
        # median ~0.25; the production artifact is free to use a wider
        # family — the windowed reference fit stays recorded alongside)
        import dataclasses

        from viforssms_tpu.core.config import FlowConfig
        from viforssms_tpu.data.features import lv_tables

        kl = args.kernel_len or 20
        nf = args.no_flows or 3
        w = args.net_width or 50
        cfg = dataclasses.replace(
            weng.cfg, flow=dataclasses.replace(
                weng.cfg.flow, kernel_len=kl, no_flows=nf,
                network_dims=(w,) * 5))
        tables, spec = lv_tables(info["obs"], info["obs_bin"],
                                 info["time_till"], kl, nf,
                                 weng.cfg.flow.feat_window, 50,
                                 x0=info["x0"], dt=info["dt"])
        weng = dataclasses.replace(weng, cfg=cfg, tables=tables, spec=spec)
    boosted = args.mean_offset and args.offset_scale != 1.0
    tag = ("lv_fullpath_off2" if boosted else
           "lv_fullpath_off" if args.mean_offset else
           "lv_fullpath_cap" if cap else
           "lv_fullpath" if args.iw_k <= 1 else f"lv_fullpath_iw{args.iw_k}")
    over = {"learn_mean_offset": True} if args.mean_offset else {}
    if boosted:
        over["offset_update_scale"] = args.offset_scale
    if args.iw_k > 1:
        eng = SequenceVIEngine.from_windowed(weng, iw_k=args.iw_k,
                                             objective="iwae", **over)
    else:
        eng = SequenceVIEngine.from_windowed(weng, **over)  # 1x1 mesh
    cfg_dir = os.path.join(VAL_DIR, tag)
    os.makedirs(cfg_dir, exist_ok=True)
    ckpt = Checkpointer(os.path.join(cfg_dir, "ckpt"))
    meta_path = os.path.join(cfg_dir, "fit_meta.json")
    state = eng.init(jax.random.key(1))
    restored = ckpt.restore(state)
    if restored is None and args.iw_k > 1 and not cap:
        # warm start from the plain full-path stage when available
        base = Checkpointer(os.path.join(VAL_DIR, "lv_fullpath", "ckpt")
                            ).restore(state)
        if base is not None:
            state = state._replace(params=base.params)
            print("warm start from lv_fullpath params", flush=True)
    if restored is None and boosted:
        # params-only warm start from the unboosted offset stage (the
        # boosted optimizer has a different opt-state tree)
        plain = SequenceVIEngine.from_windowed(weng, learn_mean_offset=True)
        base = Checkpointer(os.path.join(VAL_DIR, "lv_fullpath_off", "ckpt")
                            ).restore(plain.init(jax.random.key(1)))
        if base is not None:
            state = state._replace(params=base.params)
            print("warm start from lv_fullpath_off params", flush=True)
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
        if deficit > 0:
            state, _ = eng.fit(state, num_steps=deficit, scan_chunk=50)
            ckpt.save(state)
            fit_done += deficit
        with open(meta_path, "w") as f:
            json.dump({"fit_steps": fit_done}, f)
    else:
        state = eng.pretrain(state, num_steps=args.pretrain, finite_gate=1000,
                             scan_chunk=50)
        state, _ = eng.fit(state, num_steps=args.steps, scan_chunk=50)
        ckpt.save(state)
        with open(meta_path, "w") as f:
            json.dump({"fit_steps": args.steps}, f)
    wall = time.time() - t0
    print(f"full-path LV trained in {wall:.0f}s", flush=True)

    vi_paths = _vi_paths_batched(eng, state.params, jax.random.key(22), 8)
    paths = _path_block(vi_paths.reshape(vi_paths.shape[0], -1), gold_paths)

    # theta stays prior-pinned (scale 1e-4) at this config — direct check
    vi_theta = eng.sample_theta(state.params, jax.random.key(23), 20_000)
    theta_pin = np.asarray(info["theta_prior_mean"], np.float32)
    elbo, se = eng.estimate_elbo(state.params, jax.random.key(45), 10)
    out = {
        "config": tag,
        "flow_config": {"kernel_len": weng.cfg.flow.kernel_len,
                        "no_flows": weng.cfg.flow.no_flows,
                        "network_dims": list(weng.cfg.flow.network_dims),
                        "mean_offset": bool(args.mean_offset),
                        "offset_update_scale": args.offset_scale},
        "gold_standard": "same cached pinned-theta path NUTS as "
                         "validation/lv_partial.json",
        "gold_file": gold_file,
        "vi_steps": args.steps,
        "elbo_fullpath": [elbo, se],
        "paths": paths,
        "theta_abs_diff_from_prior": np.abs(
            vi_theta.mean(0) - theta_pin).tolist(),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(VAL_DIR, f"{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"saved validation/{tag}.json", flush=True)
    print(f"path bias/sd median {paths['bias_sd_median']:.3f} "
          f"(windowed r2: 0.269), frac|z|>2 {paths['z_frac_gt2']:.3f}, "
          f"max bias/sd {paths['bias_sd_max']:.2f}", flush=True)


if __name__ == "__main__":
    main()
