from viforssms_tpu.inference.vi.adamax import adamax, clipped_adamax
from viforssms_tpu.inference.vi.theta_flow import MADE, ThetaPosterior

__all__ = ["MADE", "ThetaPosterior", "adamax", "clipped_adamax"]
