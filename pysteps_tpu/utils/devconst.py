"""Device-constant cache.

Model constants (bandpass filter banks, taper windows, DFT matrices) are
pure functions of shape/config.  Re-uploading them per forecast call is
costly when the host-device link is slow (the axon-tunneled TPU moves
~18 MB/s; a 512^2 8-level filter bank alone is 4.2 MB, ~0.25 s per call).
``cached_constant`` memoizes the computed host array AND its device copy
per (key, backend), so repeated forecasts re-use the resident buffer.
"""

import jax
import jax.numpy as jnp

_cache = {}


def cached_constant(key, builder):
    """Return a device array for ``builder()`` (a host-side numpy factory),
    cached by ``key`` and the active JAX backend.

    The key must capture everything the builder output depends on.
    """
    full_key = (jax.default_backend(), key)
    if full_key not in _cache:
        _cache[full_key] = jnp.asarray(builder())
    return _cache[full_key]


def clear():
    _cache.clear()
