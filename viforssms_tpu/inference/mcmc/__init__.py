from viforssms_tpu.inference.mcmc.diagnostics import ess, split_rhat, summarize
from viforssms_tpu.inference.mcmc.hmc import DualAveragingState, hmc_sample
from viforssms_tpu.inference.mcmc.nuts import nuts_sample
from viforssms_tpu.inference.mcmc.pmmh import pmmh, pmmh_chains, pmmh_for_model

# Back-compat alias from when an unrolled variant coexisted with the
# iterative sampler; there is one NUTS now (inference/mcmc/nuts.py).
nuts_sample_iterative = nuts_sample

__all__ = [
    "DualAveragingState",
    "ess",
    "hmc_sample",
    "nuts_sample",
    "nuts_sample_iterative",
    "pmmh",
    "pmmh_chains",
    "pmmh_for_model",
    "split_rhat",
    "summarize",
]
