from viforssms_tpu.flows.nma import ConvIAF, NMAFlowStack, pairwise_swap

__all__ = ["ConvIAF", "NMAFlowStack", "pairwise_swap"]
