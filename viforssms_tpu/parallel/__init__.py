from viforssms_tpu.parallel.halo import halo_exchange_left, sharded_causal_conv1d
from viforssms_tpu.parallel.mesh import make_mesh, particle_sharding, replicated
from viforssms_tpu.parallel.multihost import (
    global_mesh,
    replicate_global,
    shard_global,
)

__all__ = [
    "global_mesh",
    "halo_exchange_left",
    "make_mesh",
    "particle_sharding",
    "replicate_global",
    "replicated",
    "shard_global",
    "sharded_causal_conv1d",
]
