"""Shared test helpers: synthetic radar-like data generation."""

import numpy as np


def make_synthetic_sequence(
    n_frames=6, shape=(256, 256), velocity=(2.0, 1.0), seed=42
):
    rng = np.random.RandomState(seed)
    m, n = shape
    yy, xx = np.meshgrid(np.arange(m), np.arange(n), indexing="ij")

    # correlated texture: power-law filtered white noise
    noise = rng.randn(m, n)
    fy = np.fft.fftfreq(m)[:, None]
    fx = np.fft.rfftfreq(n)[None, :]
    r = np.sqrt(fy**2 + fx**2)
    r[0, 0] = 1.0
    filt = r ** (-1.5)
    filt[0, 0] = 0.0
    texture = np.fft.irfft2(np.fft.rfft2(noise) * filt, s=shape)
    texture = (texture - texture.mean()) / texture.std()

    # several rain cells
    base = np.zeros(shape)
    for cx, cy, amp, sc in [
        (0.3, 0.4, 12.0, 28.0),
        (0.55, 0.55, 8.0, 40.0),
        (0.7, 0.3, 15.0, 22.0),
        (0.4, 0.7, 6.0, 35.0),
    ]:
        base += amp * np.exp(
            -(((xx - cx * n) ** 2 + (yy - cy * m) ** 2) / (2 * sc**2))
        )

    field0 = base * np.exp(0.6 * texture)
    field0[field0 < 0.5] = 0.0

    u, v = velocity
    frames = []
    for t in range(n_frames):
        # exact shift by (u, v) per frame via Fourier phase shift
        shift_y, shift_x = v * t, u * t
        F = np.fft.fft2(field0)
        ky = np.fft.fftfreq(m)[:, None]
        kx = np.fft.fftfreq(n)[None, :]
        phase = np.exp(-2j * np.pi * (ky * shift_y + kx * shift_x))
        f = np.real(np.fft.ifft2(F * phase))
        f[f < 0.1] = 0.0
        frames.append(f)
    return np.stack(frames)


