"""Platform selection for CLI entry points.

The container's sitecustomize can force a platform via jax.config, which wins
over the JAX_PLATFORMS env var. `configure_platform()` gives users an explicit
knob (MACARONS_PLATFORM=cpu|tpu|...) that is applied through jax.config before
first backend use — e.g. to debug a training run on CPU.
"""

import os


def configure_platform(enable_compilation_cache: bool = True):
    plat = os.environ.get("MACARONS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    if enable_compilation_cache:
        # Entry points trigger a dozen heavy jits; persist compiled executables
        # across processes (MACARONS_CACHE_DIR overrides the location).
        import jax

        cache_dir = os.environ.get(
            "MACARONS_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "macarons_tpu_jax"),
        )
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
