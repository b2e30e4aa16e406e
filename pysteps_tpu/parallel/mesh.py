"""
Device-mesh construction and sharding helpers.

The framework's single distribution mechanism (SURVEY.md §5.8): a
``Mesh("ens", "y", "x")``.  Ensemble members are pure data parallelism over
``ens`` (communication-free until the final gather / ensemble statistics);
the radar grid can additionally shard over ``y``/``x`` with halo exchange
for advection.  The reference has no distributed backend at all (its
concurrency is a dask thread pool over members, pysteps/nowcasts/utils.py:
464-512) — this module is the TPU-native replacement.
"""


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(ens=None, y=1, x=1, devices=None):
    """Build a Mesh with axes ("ens", "y", "x").

    ``ens=None`` uses all remaining devices on the ensemble axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if ens is None:
        ens = n // (y * x)
    if ens * y * x > n:
        raise ValueError(
            f"mesh {ens}x{y}x{x} needs {ens * y * x} devices, have {n}"
        )
    dev_array = np.array(devices[: ens * y * x]).reshape(ens, y, x)
    return Mesh(dev_array, ("ens", "y", "x"))


def ens_sharding(mesh):
    """Sharding that splits the leading (member) axis over "ens"."""
    return NamedSharding(mesh, P("ens"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_ensemble(tree, mesh):
    """Place every array in a pytree with a leading member axis onto the
    ensemble mesh axis."""
    if mesh is None:
        return tree
    sh = ens_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)
