"""graphnet-tpu: TPU-native GNN event reconstruction framework."""

import os


def _maybe_enable_persistent_compile_cache() -> None:
    """Opt-in XLA compilation cache across processes.

    Set ``GRAPHNET_JAX_CACHE=<dir>`` to cache compiled executables so
    repeated runs skip first-epoch compiles (one per padded batch shape).
    Opt-in rather than default: standard TPU runtimes benefit, but
    remote-compile setups may not (measured slower on a tunneled backend).
    """
    cache_dir = os.environ.get("GRAPHNET_JAX_CACHE", "")
    if not cache_dir or cache_dir.lower() == "off":
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # never fail import over a cache nicety
        pass


_maybe_enable_persistent_compile_cache()
