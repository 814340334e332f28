from .logging import get_logger

__all__ = ["get_logger", "enable_compilation_cache"]


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (safe to call before/after backend init).

    CFFM programs contain deliberately fusion-heavy formulations (e.g. the
    9-tap dwconv 'shifts' form) whose first compile runs minutes; the cache
    makes that a once-per-user cost across CLI invocations and eval shapes.

    Default location is per-user (``$VSS_CFFM_CACHE_DIR``, else
    ``~/.cache/vss_cffm_jax_cache``) — a world-shared /tmp path collides
    across users on multi-tenant hosts (permissions, foreign entries).
    """
    import os

    import jax

    if path is None:
        path = os.environ.get("VSS_CFFM_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "vss_cffm_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax or unsupported backend: cache is best-effort
        pass
