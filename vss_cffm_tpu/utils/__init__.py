from .logging import get_logger

__all__ = ["get_logger", "enable_compilation_cache"]


def enable_compilation_cache(path: str = "/tmp/vss_cffm_jax_cache") -> None:
    """Persistent XLA compilation cache (safe to call before/after backend init).

    CFFM programs contain deliberately fusion-heavy formulations (e.g. the
    9-tap dwconv 'shifts' form) whose first compile runs minutes; the cache
    makes that a once-per-machine cost across CLI invocations and eval
    shapes.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax or unsupported backend: cache is best-effort
        pass
