from viforssms_tpu.core.config import (
    FlowConfig,
    MeshConfig,
    TrainConfig,
    VIConfig,
)
from viforssms_tpu.core.prng import key_seq, split_like

__all__ = [
    "FlowConfig",
    "MeshConfig",
    "TrainConfig",
    "VIConfig",
    "key_seq",
    "split_like",
]
