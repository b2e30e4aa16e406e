"""
Packed Hermitian spectral layout: rfft2 half-planes at n/2 lanes.

An rfft2 half-plane of an even-width real field has ``n//2 + 1`` columns.
TPU vector registers tile the lane (last) axis in units of 128, so a
257-column spectral array occupies 3 lane tiles (384 lanes) — ~33 % of
every read, write and VPU op on the dominant spectral state is padding
(docs/PERFORMANCE.md roofline item 1).

This module stores the half-plane PACKED at exactly ``n//2`` columns by
folding the Nyquist column into the DC column's imaginary part — the 2-D
analogue of classic real-FFT packing.  Both the kx=0 column ``A`` and the
kx=n/2 column ``B`` of a real field's rfft2 are conjugate-symmetric along
ky (each is the DFT of a real sequence), so the combination

    P[:, 0]  = A + i*B          P[:, 1:] = X[:, 1:n//2]

is lossless: ``A[ky] = (P0[ky] + conj(P0[-ky]))/2`` and
``B[ky] = (P0[ky] - conj(P0[-ky]))/(2i)``.

Consequences used throughout (all exact, no approximation):

- An elementwise multiply by a REAL half-plane coefficient array ``w``
  (bandpass filter bank, noise filter) becomes, on the packed column,
  ``c*P0 + d*conj(flip(P0))`` with ``c = (w0+wN)/2``, ``d = (w0-wN)/2``
  and ``flip`` the ky -> (-ky) mod m index reversal; interior columns
  multiply directly.  The correction is O(m) work on an O(m*n) op.
- Parseval sums: ``sum_ky |P0|^2 = sum |A|^2 + sum |B|^2`` (the cross
  term cancels over conjugate-symmetric pairs), so the packed dof
  weights are 1 for column 0 and 2 for the interior — and the spatial
  mean is ``Re(P[0,0]) / (m*n)``.
- The rfft2 of WHITE noise has iid CN interior bins and
  conjugate-symmetric 0/Nyquist columns; packed, column 0 is simply iid
  complex normal at twice the interior variance (``A + iB`` = DFT of a
  complex white sequence).  The Hermitianization pass of the unpacked
  draw disappears.
- The inverse-DFT matmul (ops/matfft.py) consumes the packed layout
  directly: stage 1 (row-axis inverse c2c DFT) is linear and acts on the
  packed column unchanged — producing ``a(y) + i*b(y)``, the real
  spatial-y profiles of the DC and Nyquist columns — and stage 2 uses
  (n/2, n) matrices whose row 0 is ``1/n`` in cos and ``-(-1)^x / n`` in
  sin, splicing those profiles back with the right bases.  512-column
  matrices tile the MXU/lanes exactly.

Used by the spectral-domain STEPS scan (nowcasts/steps.py) for the AR
state, noise draw and recompose path (reference semantics:
pysteps/nowcasts/steps.py:122-126 ``domain="spectral"``).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def enabled(n):
    """Packing is OPT-IN (PYSTEPS_TPU_PACK=1), even-width grids only.

    Measured negative result (r4, docs/PERFORMANCE.md "Packed spectral
    layout"): the v5e profiler trace shows XLA lays the (…, m, 257)
    spectral arrays out with the 257-axis on SUBLANES (padding 257→264,
    ~3%), not lanes (257→384, 33%) — the whole-state copy ops shrink by
    only 2% under packing — while the folded-column corrections (ky
    flips + concatenates inside the hot fusions) cost ~+13% scan time.
    Kept as infrastructure: the packed white draw and packed inverse-DFT
    matmuls are exact and tested, and the layout wins if a future
    backend pins the half-plane axis to lanes."""
    return n % 2 == 0 and os.environ.get("PYSTEPS_TPU_PACK", "0") == "1"


def _flip_ky(col):
    """index ky -> (m - ky) mod m along the last axis."""
    return jnp.roll(col[..., ::-1], 1, axis=-1)


def pack(X):
    """(..., m, n//2+1) rfft2 half-plane -> (..., m, n//2) packed."""
    col0 = X[..., :, 0] + 1j * X[..., :, -1]
    return jnp.concatenate(
        [col0[..., None], X[..., :, 1:-1]], axis=-1
    ).astype(X.dtype)


def unpack(P):
    """(..., m, n//2) packed -> (..., m, n//2+1) rfft2 half-plane."""
    col0 = P[..., :, 0]
    fc = jnp.conj(_flip_ky(col0))
    A = 0.5 * (col0 + fc)
    B = -0.5j * (col0 - fc)
    return jnp.concatenate(
        [A[..., None], P[..., :, 1:], B[..., None]], axis=-1
    ).astype(P.dtype)


def mul_real(P, w):
    """Elementwise multiply of a packed plane by a REAL half-plane
    coefficient array ``w`` (..., m, n//2+1); broadcasts over leading
    axes (e.g. a (k, m, rf) filter bank against a (m, n//2) plane).

    Exactness requires ``w`` to be ky-symmetric on the two folded columns
    (``w[ky, 0] == w[-ky, 0]`` and likewise at kx = n/2) so the scaled
    columns stay conjugate-symmetric.  Every coefficient array in the
    pipeline satisfies this by construction: radial bandpass weights
    depend on |k| only, and |FFT| noise filters of real fields inherit it
    from Hermitian symmetry."""
    c0 = 0.5 * (w[..., :, 0] + w[..., :, -1])
    d0 = 0.5 * (w[..., :, 0] - w[..., :, -1])
    col0 = P[..., :, 0]
    new0 = c0 * col0 + d0 * jnp.conj(_flip_ky(col0))
    return jnp.concatenate(
        [new0[..., None], P[..., :, 1:] * w[..., :, 1:-1]], axis=-1
    )


def mean(P, shape):
    """Spatial mean via the DC bin (= Re of the packed [0,0])."""
    return jnp.real(P[..., 0, 0]) / float(shape[0] * shape[1])


def std(P, shape):
    """Spatial std via Parseval on the packed plane (packed column dof
    weight 1 — it holds the two singly-counted columns — interior 2)."""
    p2 = jnp.real(P) ** 2 + jnp.imag(P) ** 2
    res = (
        2.0 * jnp.sum(p2, axis=(-2, -1))
        - jnp.sum(p2[..., :, 0], axis=-1)
        - jnp.real(P[..., 0, 0]) ** 2
    )
    return jnp.sqrt(jnp.maximum(res, 0.0)) / float(shape[0] * shape[1])


def zero_dc(P):
    """Zero the field's DC bin (real part of packed [0,0]) only — the
    imaginary part carries the Nyquist column's own DC and is kept."""
    return P.at[..., 0, 0].add(-jnp.real(P[..., 0, 0]))


def add_dc(P, val):
    """Add ``val`` (a real DC-bin value, i.e. mean * m * n) to the field
    DC without touching the folded Nyquist DC."""
    return P.at[..., 0, 0].add(val)


def white(key, input_shape, dtype=jnp.float32):
    """Packed rfft2(white N(0,1)) — exact in law.

    Interior bins: Re/Im ~ N(0, mn/2).  Packed column 0 = A + iB where
    A, B are independent DFTs of real white columns; equivalently the
    DFT of one complex white sequence, so Re/Im ~ N(0, mn) iid — no
    Hermitian correction needed (cf. fftgenerators._spectral_white).
    """
    m, n = input_shape
    h = n // 2
    z = jax.random.normal(key, (m, h, 2), dtype=dtype) * np.sqrt(m * n / 2.0)
    W = jax.lax.complex(z[..., 0], z[..., 1])
    colscale = jnp.ones((h,), dtype).at[0].set(np.sqrt(2.0))
    return W * colscale


@functools.lru_cache(maxsize=8)
def _idft_mats_packed(m, n):
    """Stage-2 inverse-DFT matrices consuming the packed (m, n//2) layout
    (stage 1 reuses matfft's (m, m) cos/sin pair)."""
    from pysteps_tpu.ops.matfft import _idft_mats

    C, S, _, _ = _idft_mats(m, n)
    h = n // 2
    kk = np.arange(h)
    x = np.arange(n)
    w = np.full(h, 2.0, np.float32)
    w[0] = 1.0
    Cr = (np.cos(2 * np.pi * np.outer(kk, x) / n) * w[:, None] / n).astype(
        np.float32
    )
    Sr = (np.sin(2 * np.pi * np.outer(kk, x) / n) * w[:, None] / n).astype(
        np.float32
    )
    # row 0 carries BOTH folded columns: the real part (DC profile a(y))
    # enters with basis 1/n, the imaginary part (Nyquist profile b(y))
    # with basis (-1)^x / n.  Stage 2 computes Yr@Cr - Yi@Sr, so
    # Sr[0, x] = -(-1)^x / n routes b(y) to +(-1)^x / n.
    Sr[0] = -((-1.0) ** x).astype(np.float32) / n
    return C, S, Cr, Sr


def irfft2_mat(P, shape, precision="high"):
    """Inverse rfft2 of a PACKED (..., m, n//2) plane via DFT matmuls;
    equivalent to ``jnp.fft.irfft2(unpack(P), s=shape)`` (ops/matfft.py
    for the unpacked variant and the MXU rationale)."""
    m, n = shape
    C, S, Cr, Sr = _idft_mats_packed(m, n)
    ein = functools.partial(jnp.einsum, precision=precision)
    Xr = jnp.real(P)
    Xi = jnp.imag(P)
    Yr = ein("km,...mr->...kr", C, Xr) - ein("km,...mr->...kr", S, Xi)
    Yi = ein("km,...mr->...kr", C, Xi) + ein("km,...mr->...kr", S, Xr)
    return ein("...kr,rx->...kx", Yr, Cr) - ein("...kr,rx->...kx", Yi, Sr)


def irfft2(P, shape):
    """Packed inverse rfft2: matmul path on MXU backends at supported
    sizes, otherwise unpack + XLA FFT."""
    from pysteps_tpu.ops import matfft

    if matfft.use_matfft() and matfft.supported(shape):
        return irfft2_mat(P, shape)
    return jnp.fft.irfft2(unpack(P), s=shape)
