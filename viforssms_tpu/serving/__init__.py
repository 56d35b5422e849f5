"""Production serving: AOT-exported samplers + a lightweight HTTP server.

The reference's only "inference" surface is re-running the training script to
dump txt samples (``AR.py:323-362``, ``sess.run(theta_dist.sample([100000]))``
at ``SV_dense.py:458-459``). For deployment, this package instead freezes a
trained posterior into a self-contained **serialized StableHLO artifact**
(``jax.export``): parameters and feature tables are baked in as constants,
shapes are static, and the artifact can be loaded and executed without the
model code — on CPU or TPU from the same file (multi-platform lowering).

``export.py``  — build/save/load artifacts for the theta sampler and the
                 posterior path sampler of a trained ``VIEngine``.
``server.py``  — stdlib-only threaded HTTP server over a loaded artifact
                 bundle (JSON in/out): /healthz, /sample_theta,
                 /sample_paths.
"""

from viforssms_tpu.serving.export import (
    PosteriorArtifacts,
    export_posterior,
    load_artifacts,
    save_artifacts,
)
from viforssms_tpu.serving.server import PosteriorServer

__all__ = [
    "PosteriorArtifacts",
    "export_posterior",
    "save_artifacts",
    "load_artifacts",
    "PosteriorServer",
]
