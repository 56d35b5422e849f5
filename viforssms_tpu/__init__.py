"""viforssms_tpu — TPU-native variational inference for neural-moving-average SSMs.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo mehrnazmo/VIforSSMs (TF-1.8 research scripts): scalable variational
inference of state-space models with local causal-convolution IAF samplers
("neural moving average" flows, arXiv:1910.00879), masked-autoregressive-flow
theta posteriors, reparameterized minibatch ELBOs, plus NUTS/HMC and bootstrap
SMC gold-standard validators — all built TPU-first with named-mesh sharding.

Layer map (cf. SURVEY.md §7):
    core/           PRNG discipline, configs, dtype policy
    distributions/  Normal / MVN / bivariate-tril / transformed dists, bijectors
    flows/          the NMA causal-conv IAF sampler + flow stack
    models/         SSM interface + AR(1), Lotka-Volterra, FitzHugh-Nagumo, SV
    inference/      vi (ELBO, Adamax, theta flow, train loop), mcmc, smc
    data/           on-device window/feature pipeline, generators, txt IO
    parallel/       mesh construction, shardings, halo-exchange collectives
    ops/            Pallas TPU kernels for the hot paths
    utils/          metrics, checkpointing, NaN monitors, profiling
    cli/            hyperparameter-file + flag driver (reference main.py parity)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level API (keeps `import viforssms_tpu` dependency-light).
    top = {
        "VIEngine": ("viforssms_tpu.inference.vi.train", "VIEngine"),
        "VIConfig": ("viforssms_tpu.core.config", "VIConfig"),
        "FlowConfig": ("viforssms_tpu.core.config", "FlowConfig"),
        "TrainConfig": ("viforssms_tpu.core.config", "TrainConfig"),
        "NMAFlowStack": ("viforssms_tpu.flows.nma", "NMAFlowStack"),
        "ThetaPosterior": ("viforssms_tpu.inference.vi.theta_flow", "ThetaPosterior"),
        "make_mesh": ("viforssms_tpu.parallel.mesh", "make_mesh"),
        "MetricWriter": ("viforssms_tpu.utils.metrics", "MetricWriter"),
        "SummaryWriter": ("viforssms_tpu.utils.tensorboard", "SummaryWriter"),
        "hmc_sample": ("viforssms_tpu.inference.mcmc.hmc", "hmc_sample"),
        "nuts_sample": ("viforssms_tpu.inference.mcmc.nuts", "nuts_sample"),
        # back-compat alias: the unrolled variant was removed; one NUTS now
        "nuts_sample_iterative": (
            "viforssms_tpu.inference.mcmc.nuts", "nuts_sample"),
        "bootstrap_filter": (
            "viforssms_tpu.inference.smc.bootstrap", "bootstrap_filter"),
    }
    if name in top:
        import importlib

        mod, attr = top[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
