"""
Spatially sharded advection with halo exchange.

For grids too large for one chip, the radar domain shards over the mesh's
"y" axis and the semi-Lagrangian gather needs rows from neighbouring
shards.  With the displacement bounded by ``halo`` (the same static bound
the shift-decomposition warp uses), each shard exchanges ``halo`` boundary
rows with its neighbours via ``ppermute`` per step and warps its extended
block locally — the communication pattern laid out in SURVEY.md §5.8.
"""


import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pysteps_tpu.ops.warp import warp_shifted


def _exchange_halos(f_local, halo, axis_name):
    """Receive ``halo`` rows from the previous/next shard along
    ``axis_name`` (edge shards replicate their own boundary rows)."""
    idx = jax.lax.axis_index(axis_name)
    size = jax.lax.axis_size(axis_name)

    # bottom rows of the previous shard -> my top halo
    from_prev = jax.lax.ppermute(
        f_local[-halo:], axis_name,
        [(i, (i + 1) % size) for i in range(size)],
    )
    # top rows of the next shard -> my bottom halo
    from_next = jax.lax.ppermute(
        f_local[:halo], axis_name,
        [(i, (i - 1) % size) for i in range(size)],
    )
    # edge replication at the domain boundary
    top_edge = jnp.repeat(f_local[:1], halo, axis=0)
    bottom_edge = jnp.repeat(f_local[-1:], halo, axis=0)
    top = jnp.where(idx == 0, top_edge, from_prev)
    bottom = jnp.where(idx == size - 1, bottom_edge, from_next)
    return jnp.concatenate([top, f_local, bottom], axis=0)


def sharded_warp(field, displacement, mesh, max_disp, cval=0.0):
    """Backward-warp a (m, n) field sharded over the mesh "y" axis.

    Equivalent to ``warp_shifted(field, displacement, max_disp)`` but with
    the rows distributed: each shard exchanges ``max_disp`` halo rows with
    its neighbours (ppermute over ICI) and resamples its extended block.
    """
    halo = int(max_disp)

    def shard_fn(f_local, d_local):
        extended = _exchange_halos(f_local, halo, "y")
        # displacement rows for the halo region are irrelevant (their
        # outputs are discarded); pad with edge values
        d_ext = jnp.concatenate(
            [
                jnp.repeat(d_local[:, :1], halo, axis=1),
                d_local,
                jnp.repeat(d_local[:, -1:], halo, axis=1),
            ],
            axis=1,
        )
        out_ext = warp_shifted(extended, d_ext, halo, mode="nearest")
        out = out_ext[halo:-halo]
        # constant-fill outside the global domain
        m_loc = f_local.shape[0]
        idx = jax.lax.axis_index("y")
        size = jax.lax.axis_size("y")
        row0 = idx * m_loc
        m_glob = size * m_loc
        n = f_local.shape[1]
        gy = row0 + jax.lax.broadcasted_iota(jnp.int32, (m_loc, n), 0)
        gx = jax.lax.broadcasted_iota(jnp.int32, (m_loc, n), 1)
        cy = gy.astype(d_local.dtype) + d_local[1]
        cx = gx.astype(d_local.dtype) + d_local[0]
        inside = (cy >= 0) & (cy <= m_glob - 1) & (cx >= 0) & (cx <= n - 1)
        return jnp.where(inside, out, cval)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("y", None), P(None, "y", None)),
        out_specs=P("y", None),
    )
    return fn(field, displacement)
