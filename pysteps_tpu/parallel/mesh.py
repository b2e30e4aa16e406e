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


def make_mesh_multihost(y=1, x=1):
    """DCN-aware mesh for a multi-host TPU slice.

    Lays the ensemble axis across HOSTS (pure data parallelism — member
    streams never communicate until the final gather, so the slow DCN link
    only carries the per-host output shards) and the spatial y/x axes
    within each host, so halo exchanges and the distributed-FFT
    ``all_to_all`` ride ICI.  This is the scaling-book recipe: put the
    communication-free axis on the slow interconnect.

    On a single host this degenerates to :func:`make_mesh`.
    """
    n_proc = jax.process_count()
    local = jax.local_device_count()
    if y * x > local:
        raise ValueError(
            f"spatial axes y*x={y * x} exceed local device count {local}"
        )
    if n_proc == 1:
        return make_mesh(ens=local // (y * x), y=y, x=x)
    from jax.experimental import mesh_utils

    ens = (n_proc * local) // (y * x)
    dev_array = mesh_utils.create_hybrid_device_mesh(
        (local // (y * x), y, x),
        (n_proc, 1, 1),
        devices=jax.devices(),
    ).reshape(ens, y, x)
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
