"""Platform selection for CLI entry points.

The container's sitecustomize can force a platform via jax.config, which wins
over the JAX_PLATFORMS env var. `configure_platform()` gives users an explicit
knob (MACARONS_PLATFORM=cpu|tpu|...) that is applied through jax.config before
first backend use — e.g. to debug a training run on CPU.
"""

import os


def configure_platform():
    plat = os.environ.get("MACARONS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
