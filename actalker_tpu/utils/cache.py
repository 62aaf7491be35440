"""Persistent XLA compilation cache (works through the axon remote-compile
tunnel; measured 9x faster re-runs for pallas-heavy programs)."""
import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
