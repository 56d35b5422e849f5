from viforssms_tpu.inference.smc.bootstrap import bootstrap_filter, systematic_resample

__all__ = ["bootstrap_filter", "systematic_resample"]
