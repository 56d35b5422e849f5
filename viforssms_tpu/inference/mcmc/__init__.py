from viforssms_tpu.inference.mcmc.hmc import DualAveragingState, hmc_sample
from viforssms_tpu.inference.mcmc.nuts import nuts_sample
from viforssms_tpu.inference.mcmc.nuts_iterative import nuts_sample_iterative

__all__ = [
    "DualAveragingState",
    "hmc_sample",
    "nuts_sample",
    "nuts_sample_iterative",
]
