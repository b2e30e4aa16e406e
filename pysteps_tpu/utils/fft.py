"""
FFT namespace (reference: pysteps/utils/fft.py:20,39,61).

On TPU there is exactly one FFT that matters: XLA's.  This module provides
the reference's uniform namespace (fft2/ifft2/rfft2/irfft2/fftshift/
ifftshift/fftfreq) over ``jnp.fft`` so code written against the pysteps FFT
abstraction ports over; the numpy/scipy/pyfftw distinction collapses to a
single backend.
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np


def get_fft(shape, fftn_shape=None, **kwargs):
    """Return an FFT namespace bound to a field shape."""
    f = {
        "fft2": jnp.fft.fft2,
        "ifft2": jnp.fft.ifft2,
        "rfft2": jnp.fft.rfft2,
        "irfft2": lambda X: jnp.fft.irfft2(X, s=shape),
        "fftshift": jnp.fft.fftshift,
        "ifftshift": jnp.fft.ifftshift,
        "fftfreq": np.fft.fftfreq,
    }
    if fftn_shape is not None:
        f["fftn"] = jnp.fft.fftn
    fft = SimpleNamespace(**f)
    fft.shape = shape
    return fft


# API-parity aliases: any requested backend is XLA underneath
def get_numpy(shape, **kwargs):
    return get_fft(shape, **kwargs)


def get_scipy(shape, **kwargs):
    return get_fft(shape, **kwargs)


def get_pyfftw(shape, **kwargs):
    return get_fft(shape, **kwargs)
