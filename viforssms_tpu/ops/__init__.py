from viforssms_tpu.ops.fused_conv import causal_conv_theta_elu

__all__ = ["causal_conv_theta_elu"]
