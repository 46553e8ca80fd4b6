"""Shared helper: persistent XLA compile cache for benchmark scripts."""

import os


def init_compile_cache():
    """Cold AOT compiles on the tunneled TPU backend run for minutes; the
    persistent cache makes every re-invocation near-free."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "KZG_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/kzg_tpu_jax_cache")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
