from viforssms_tpu.parallel.mesh import make_mesh, particle_sharding, replicated
from viforssms_tpu.parallel.halo import halo_exchange_left, sharded_causal_conv1d

__all__ = [
    "make_mesh",
    "particle_sharding",
    "replicated",
    "halo_exchange_left",
    "sharded_causal_conv1d",
]
