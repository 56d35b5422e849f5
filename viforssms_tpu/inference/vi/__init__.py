from viforssms_tpu.inference.vi.adamax import adamax, clipped_adamax
from viforssms_tpu.inference.vi.theta_flow import MADE, ThetaPosterior

__all__ = [
    "MADE",
    "ThetaPosterior",
    "adamax",
    "clipped_adamax",
    "make_sequence_train_step",
    "sequence_sharded_elbo",
]


def __getattr__(name):
    # lazy: sequence_train pulls in flows/parallel at import time
    if name in ("make_sequence_train_step", "sequence_sharded_elbo"):
        from viforssms_tpu.inference.vi import sequence_train

        return getattr(sequence_train, name)
    raise AttributeError(name)
