from viforssms_tpu.utils.metrics import MetricWriter
from viforssms_tpu.utils.checkpoint import Checkpointer
from viforssms_tpu.utils.debug import nonfinite_counts

__all__ = ["MetricWriter", "Checkpointer", "nonfinite_counts"]
