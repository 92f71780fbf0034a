"""Backend selection + persistent compile cache for CLI entry points."""

import os

import jax


def configure_backend(platform: str = "default", cache_dir: str = None):
    """Select the jax platform and enable the persistent compile cache.

    Must run before the first jax backend use. The cache turns the 60-400 s
    first-compile cost of a fresh CLI process (e.g. a --resume restart after
    preemption) into a near-instant reload for identical model/shape configs.

    platform: 'default' keeps jax's pick (the TPU when one is attached);
    'cpu' forces host CPU — hermetic tests/debugging. On boxes whose
    sitecustomize pins jax_platforms, the env var JAX_PLATFORMS doesn't work;
    this config-API path does.
    """
    jax.config.update("jax_compilation_cache_dir",
                      cache_dir or os.environ.get(
                          "JAX_CACHE_DIR", os.path.expanduser("~/.jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if platform and platform != "default":
        try:
            jax.config.update("jax_platforms", platform)
        except RuntimeError as e:  # backend already initialized (in-process reuse)
            print(f"warning: --platform {platform} ignored ({e})")
