"""Persistent XLA compilation cache setup.

The first compile of the fused STEPS scan is expensive (especially through
remote-attached accelerators); enabling JAX's persistent cache makes every
subsequent process start warm.  Called from bench.py and __graft_entry__.py.
"""

import os


def enable(cache_dir=None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "PYSTEPS_TPU_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    )
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        if jax.default_backend() == "cpu":
            # CPU AOT entries bake in host ISA features; loading them on a
            # different machine can SIGILL — cache only accelerator builds
            return None
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — older/newer jax flag name drift
        pass
    return cache_dir
