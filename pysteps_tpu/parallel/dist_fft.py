"""
Distributed 2-D real FFT over a y-sharded grid.

The cascade decomposition is a global rfft2 (SURVEY.md §7 "hard parts":
"sharded FFTs ... distributed FFT via transpose").  For a grid whose rows
are sharded over the mesh's "y" axis the classical pencil decomposition
applies:

  rows local    -> 1-D real FFT along x is embarrassingly local
  all_to_all    -> transpose so spectral COLUMNS become local
  columns local -> 1-D complex FFT along y is local

The spectral field stays column-sharded (axis -1 over "y"), which is the
natural layout for the spectral-domain STEPS state: bandpass weights,
AR updates and Parseval statistics are pointwise/reductions there.  The
inverse runs the same pipeline backwards.  All functions are meant to be
called INSIDE ``shard_map`` (they operate on the local block and use
collectives over ``axis_name``).

Complex all_to_all is split into real/imaginary lanes (TPU collectives
move f32).
"""

import jax
import jax.numpy as jnp


def _all_to_all_split(x, axis_name, split_axis, concat_axis):
    """all_to_all for complex inputs via two f32 lanes."""
    if jnp.iscomplexobj(x):
        re = jax.lax.all_to_all(
            jnp.real(x), axis_name, split_axis=split_axis,
            concat_axis=concat_axis, tiled=True,
        )
        im = jax.lax.all_to_all(
            jnp.imag(x), axis_name, split_axis=split_axis,
            concat_axis=concat_axis, tiled=True,
        )
        return jax.lax.complex(re, im)
    return jax.lax.all_to_all(
        x, axis_name, split_axis=split_axis, concat_axis=concat_axis,
        tiled=True,
    )


def rfft2_local(f_rows, axis_name="y"):
    """rfft2 of a globally (m, n) field from its local (m_loc, n) row block.

    Returns the local (m, c_loc) column block of the (m, n//2+1) spectrum,
    where c_loc = (n//2+1 rounded up to a multiple of the shard count) /
    shards — see :func:`spec_cols` for the padded column count.
    """
    size = jax.lax.axis_size(axis_name)
    m_loc, n = f_rows.shape
    c = n // 2 + 1
    c_pad = _ceil_to(c, size)
    # 1) local real FFT along x -> (m_loc, c), pad columns to split evenly
    fx = jnp.fft.rfft(f_rows, axis=1)
    fx = jnp.pad(fx, ((0, 0), (0, c_pad - c)))
    # 2) transpose: split columns over shards, gather all rows
    #    (m_loc, c_pad) -> (m, c_loc)
    ft = _all_to_all_split(fx, axis_name, split_axis=1, concat_axis=0)
    # 3) local complex FFT along y over the full row extent
    return jnp.fft.fft(ft, axis=0)


def irfft2_local(spec_cols, shape, axis_name="y"):
    """Inverse of :func:`rfft2_local`: local (m, c_loc) spectral columns ->
    local (m_loc, n) spatial rows of the (m, n) field."""
    size = jax.lax.axis_size(axis_name)
    m, n = shape
    c = n // 2 + 1
    c_pad = _ceil_to(c, size)
    c_loc = c_pad // size
    # 1) inverse FFT along y locally
    fy = jnp.fft.ifft(spec_cols, axis=0)
    # 2) transpose back: split rows, gather columns -> (m_loc, c_pad)
    fx = _all_to_all_split(fy, axis_name, split_axis=0, concat_axis=1)
    # 3) drop the column padding, inverse real FFT along x
    return jnp.fft.irfft(fx[:, :c], n=n, axis=1)


def _ceil_to(v, mult):
    return ((v + mult - 1) // mult) * mult


def spec_cols(n, size):
    """Local spectral-column count for a width-n grid on ``size`` shards."""
    return _ceil_to(n // 2 + 1, size) // size


def spec_col_mask(n, size, axis_name="y"):
    """Validity mask (c_loc,) for the local spectral columns (the global
    column padding introduced by :func:`rfft2_local` is invalid)."""
    c = n // 2 + 1
    c_loc = spec_cols(n, size)
    idx = jax.lax.axis_index(axis_name)
    col0 = idx * c_loc
    cols = col0 + jnp.arange(c_loc)
    return cols < c


def spec_weight_local(n, size, axis_name="y"):
    """Parseval weights (c_loc,) of the local spectral columns: interior
    rfft2 columns count twice (conjugate half-plane), the DC and Nyquist
    columns once, padded columns zero."""
    c = n // 2 + 1
    c_loc = spec_cols(n, size)
    idx = jax.lax.axis_index(axis_name)
    cols = idx * c_loc + jnp.arange(c_loc)
    w = jnp.where((cols == 0) | (cols == (c - 1 if n % 2 == 0 else -1)), 1.0, 2.0)
    return jnp.where(cols < c, w, 0.0)
