

def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (client-side serialized
    executables). Over the remote-TPU tunnel a full-model compile costs
    minutes; with the cache, repeat runs of the CLIs/bench start hot."""
    import os

    import jax

    cache_dir = path or os.environ.get(
        "OPST_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "onepose_jax"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs: feature is optional
        pass
