"""CLI driver — reference ``main.py`` parity for the AR(1) pipeline.

Usage:  python -m viforssms_tpu.cli.main hyperparameters.txt [OPTIONS]

Parses the reference's positional-line hyperparameter file (``main.py:26-57``),
honors the same override flags, regenerates the AR dataset, trains, and writes
checkpoints + JSONL metrics + posterior path/theta dumps. ``-repair`` prints
the default file (``main.py:61-92``).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

DEFAULT_HYPERPARAMETERS = """\
#### T ####
5000
#### impute ####
1
#### x0 ####
10.0
#### Theta ####
5.0, 0.5, 3.0
#### Observation Standard Deviation ####
1.
#### p ####
50
#### kernel_len ####
50
#### batch_dims ####
50
#### network_dims ####
50, 50, 50
#### no_flows ####
3
####  priors ####
(0., 10.0)(0., 10.0)(0., 10.0)
#### feat_window ####
10
#### learn_rate ####
1e-3
#### grad_clip ####
2.5e8
"""


def handle_opts(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.RawDescriptionHelpFormatter,
        usage="%(prog)s hyperparameters.txt [OPTIONS]\n"
        "Options override the hyperparameters file. Use -repair to print defaults.",
    )
    parser.add_argument("file", help="File containing all hyperparameters", nargs="?")
    parser.add_argument("-T", "-time", dest="T", default=None, help="Time")
    parser.add_argument("-i", "-impute", dest="impute", default=None, help="Impute")
    parser.add_argument("-t", "-theta", action="append", dest="theta", default=None)
    parser.add_argument("-x", "-xzero", dest="x0", default=None)
    parser.add_argument("-o", "-obs_std", dest="obs_std", default=None)
    parser.add_argument("-k", "-kernel_len", dest="kernel_len", default=None)
    parser.add_argument("-b", "-batch_dims", dest="batch_dims", default=None)
    parser.add_argument("-f", "-feat_window", dest="feat_window", default=None)
    parser.add_argument("-n", "-num_steps", dest="num_steps", default=None,
                        help="Training steps (new; the reference trains forever)")
    parser.add_argument("-out", dest="out_dir", default="out/ar1",
                        help="Output directory for metrics/checkpoints/dumps")
    parser.add_argument("-tb", "--tensorboard", action="store_true", dest="tensorboard",
                        default=False,
                        help="Also write TensorBoard event files next to metrics.jsonl")
    parser.add_argument("-repair", action="store_true", dest="repair", default=False)
    return parser.parse_args(argv)


def parseparams(file):
    """Positional-line parser, format-compatible with the reference file."""
    with open(file) as f:
        lines = f.readlines()
    params = {}
    params["T"] = int(float(lines[1].rstrip()))
    params["impute"] = int(lines[3].rstrip())
    params["x0"] = float(lines[5].rstrip())
    params["theta"] = [float(t) for t in lines[7].rstrip().split(",")]
    params["obs_std"] = float(lines[9].rstrip())
    params["p"] = int(lines[11].rstrip())
    params["kernel_len"] = int(lines[13].rstrip())
    params["batch_dims"] = int(lines[15].rstrip())
    params["network_dims"] = [int(d) for d in lines[17].rstrip().split(",")]
    params["no_flows"] = int(lines[19].rstrip())
    tuples = lines[21].rstrip().replace(")", "").split("(")[1:]
    params["priors"] = [
        (float(t.split(",")[0]), float(t.split(",")[1])) for t in tuples
    ]
    params["feat_window"] = int(lines[23].rstrip())
    params["learn_rate"] = float(lines[25].rstrip())
    params["grad_clip"] = float(lines[27].rstrip())
    return params


def build_ar1(params, seed=1):
    """Engine + generated series for the AR(1) reference configuration
    (``hyperparameters.txt`` semantics). Shared by run_ar1 and
    scripts/validate_baseline.py."""
    from viforssms_tpu.core.config import FlowConfig, TrainConfig, VIConfig
    from viforssms_tpu.data.features import ar1_tables
    from viforssms_tpu.data.generate import generate_ar1
    from viforssms_tpu.inference.vi.train import VIEngine
    from viforssms_tpu.models.ar1 import AR1

    series = generate_ar1(
        T=params["T"], impute=params["impute"], x0=params["x0"],
        theta=params["theta"], obs_std=params["obs_std"], seed=seed,
    )
    cfg = VIConfig(
        p=params["p"], batch_dims=params["batch_dims"], T=params["T"],
        flow=FlowConfig(
            kernel_len=params["kernel_len"], no_flows=params["no_flows"],
            network_dims=tuple(params["network_dims"]),
            feat_window=params["feat_window"],
        ),
        train=TrainConfig(
            learn_rate=params["learn_rate"], grad_clip=params["grad_clip"],
            pre_train_steps=500, seed=seed,
        ),
        theta_num_bijectors=5,
    )
    tables, spec = ar1_tables(
        series.obs, series.obs_bin, series.time_till,
        cfg.flow.kernel_len, cfg.flow.no_flows, cfg.flow.feat_window,
        cfg.batch_dims, x0=params["x0"],
    )
    prior_mean = tuple(m for m, s in params["priors"])
    prior_scale = tuple(s for m, s in params["priors"])
    model = AR1(obs_std=params["obs_std"], prior_mean=prior_mean, prior_scale=prior_scale)
    eng = VIEngine(model=model, cfg=cfg, tables=tables, spec=spec,
                   theta_base_loc=1.5, theta_base_scale=0.5)  # AR.py:389
    return eng, series


def run_ar1(params, num_steps=2000, out_dir="out/ar1", dat_dir=None, seed=1):
    import jax

    from viforssms_tpu.data.io import save_paths_txt, save_series, save_theta_txt
    from viforssms_tpu.inference.vi.train import metrics_to_dict
    from viforssms_tpu.utils.checkpoint import Checkpointer
    from viforssms_tpu.utils.metrics import MetricWriter
    from viforssms_tpu.utils.preemption import PreemptionGuard

    eng, series = build_ar1(params, seed=seed)
    dat_dir = dat_dir or os.path.join(out_dir, "dat")
    save_series(dat_dir, "AR", series)

    state = eng.init(jax.random.key(seed))
    ckpt = Checkpointer(os.path.join(out_dir, "ckpt"))
    with MetricWriter(os.path.join(out_dir, "metrics.jsonl")) as logger:
        print("Pre-training...", flush=True)
        state = eng.pretrain(state, log_every=100, logger=logger)
        print("Training...", flush=True)
        # accelerators amortize ~25 ms/dispatch with big chunks; CPU compiles
        # the scanned program slowly, so keep it small there
        chunk = 50 if jax.default_backend() == "cpu" else 250
        with PreemptionGuard() as guard:
            state, last = eng.fit(state, num_steps=num_steps, logger=logger,
                                  checkpointer=ckpt, scan_chunk=chunk,
                                  should_stop=guard)
        if last is not None:
            print("Final metrics:", metrics_to_dict(last), flush=True)
    ckpt.save(state)
    if guard.triggered:
        print(f"Preempted at step {int(state.step)}; checkpoint saved",
              flush=True)
        return state

    paths = eng.sample_posterior_paths(state.params, jax.random.key(seed + 1))
    save_paths_txt(os.path.join(out_dir, "AR_obs_paths.txt"), paths)
    theta = eng.sample_theta(state.params, jax.random.key(seed + 2), 100_000)
    save_theta_txt(os.path.join(out_dir, "theta_posterior.txt"), theta)
    return state


def main(argv=None):
    from viforssms_tpu.core.platform import apply_platform_env

    apply_platform_env()
    args = handle_opts(argv)
    if args.tensorboard:
        os.environ["VIFORSSMS_TENSORBOARD"] = "1"
    if args.repair:
        # file content on stdout ONLY (clean roundtrip:
        # `... -repair > h.txt && ... h.txt`), the human hint on stderr,
        # exit 0 so the redirect composes in `&&` chains
        sys.stdout.write(DEFAULT_HYPERPARAMETERS)
        print("Copy the above into a .txt file", file=sys.stderr)
        return
    if not args.file:
        sys.exit("Please specify a hyperparameter file (or -repair)")
    try:
        params = parseparams(args.file)
    except Exception as e:
        sys.exit(f"Please specify a valid hyperparameter file ({e})")
    for name, cast in [("T", int), ("impute", int), ("x0", float), ("obs_std", float),
                       ("kernel_len", int), ("batch_dims", int), ("feat_window", int)]:
        v = getattr(args, name, None)
        if v is not None:
            params[name] = cast(v)
    if args.theta is not None:
        params["theta"] = [float(t) for t in args.theta]
    num_steps = int(args.num_steps) if args.num_steps else 2000
    run_ar1(params, num_steps=num_steps, out_dir=args.out_dir)


if __name__ == "__main__":
    main()
