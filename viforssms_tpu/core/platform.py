"""Platform selection helper.

This image's ``sitecustomize`` re-pins ``JAX_PLATFORMS`` to the TPU backend in
every interpreter, so the usual ``JAX_PLATFORMS=cpu`` env override is silently
lost. ``apply_platform_env()`` restores user control: set
``VIFORSSMS_PLATFORM=cpu`` (or any backend name) and call it before first
device use — all CLI entry points and benches do.
"""

from __future__ import annotations

import os


def apply_platform_env():
    plat = os.environ.get("VIFORSSMS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    return plat
