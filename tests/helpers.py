"""Shared test helpers: synthetic radar-like data generation."""

import numpy as np


def make_synthetic_sequence(
    n_frames=6, shape=(256, 256), velocity=(2.0, 1.0), seed=42,
    evolution=0.0,
):
    """Advecting rain-cell sequence.  With ``evolution`` > 0, each frame
    additionally carries an AR(1) multiplicative growth/decay field in the
    Lagrangian frame (scale = ``evolution`` in log-space), so the sequence
    is NOT pure advection: a perfect advection model still faces genuine,
    unpredictable temporal evolution.  Pure advection (evolution=0) makes
    model-parity scores degenerate — an exact Lagrangian model scores ~0
    error and any quality comparison collapses to comparing boundary
    artifacts."""
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
    ky = np.fft.fftfreq(m)[:, None]
    kx = np.fft.fftfreq(n)[None, :]

    def smooth_field():
        w = rng.randn(m, n)
        g = np.fft.irfft2(np.fft.rfft2(w) * filt, s=shape)
        return g / max(g.std(), 1e-12)

    growth = np.zeros(shape)
    rho = 0.7  # AR(1) persistence of the growth/decay field
    frames = []
    for t in range(n_frames):
        field_t = field0
        if evolution > 0.0:
            if t > 0:
                growth = rho * growth + np.sqrt(1 - rho**2) * smooth_field()
            field_t = field0 * np.exp(evolution * growth)
        # exact shift by (u, v) per frame via Fourier phase shift
        shift_y, shift_x = v * t, u * t
        F = np.fft.fft2(field_t)
        phase = np.exp(-2j * np.pi * (ky * shift_y + kx * shift_x))
        f = np.real(np.fft.ifft2(F * phase))
        f[f < 0.1] = 0.0
        frames.append(f)
    return np.stack(frames)




def encode_grib2(values, packing="png", missing=None, lat1=20.0, lon1=230.0,
                 di=0.01, dj=0.01):
    """Encode a 2-D field as a single-message GRIB2 byte string, for testing
    the pysteps_tpu GRIB2 reader.  Supports simple (5.0), complex with
    2nd-order spatial differencing (5.3), and PNG (5.41) packing.

    ``missing`` marks cells to encode as the MRMS "no coverage" value; the
    caller should pre-set them in ``values``.  Values are packed with D=3
    decimal scaling, row 0 stored as the southernmost row (scan mode 0x40).
    """
    import struct

    values = np.asarray(values, np.float64)
    nj, ni = values.shape
    n = values.size
    D, E = 3, 0
    flat = np.round(values[::-1].ravel() * 10.0**D).astype(np.int64)
    R = float(flat.min())
    X = (flat - int(R)).astype(np.int64)
    nbits = max(int(X.max()).bit_length(), 1)

    def section(number, body):
        length = 5 + len(body)
        return struct.pack(">IB", length, number) + body

    def pack_bits(vals, bits):
        if bits == 0:
            return b""
        out = np.zeros(((len(vals) * bits + 7) // 8) * 8, dtype=np.uint8)
        for i, v in enumerate(vals):
            for b in range(bits):
                if (int(v) >> (bits - 1 - b)) & 1:
                    out[i * bits + b] = 1
        return np.packbits(out).tobytes()

    # section 1: identification (2020-01-01 00:00)
    sec1 = section(1, struct.pack(">HHBBBHBBBBBBB", 7, 0, 2, 1, 1, 2020, 1,
                                  1, 0, 0, 0, 0, 1))
    # section 3: grid definition template 3.0, lat/lon
    lat2 = lat1 + dj * (nj - 1)
    lon2 = lon1 + di * (ni - 1)
    tpl3 = struct.pack(
        ">BBIBIBI", 6, 0, 0, 0, 0, 0, 0          # earth shape 6 (R=6371229)
    ) + struct.pack(
        ">IIII", ni, nj, 0, 0
    ) + struct.pack(
        ">iIBiIII B", int(lat1 * 1e6), int(lon1 * 1e6), 0x30,
        int(lat2 * 1e6), int(lon2 * 1e6), int(di * 1e6), int(dj * 1e6),
        0x40,                                     # scan: +i, +j (south->north)
    )
    sec3 = section(3, struct.pack(">BIBB H", 0, n, 0, 0, 0) + tpl3)
    # section 4: product definition template 4.0 (category 6, number 1)
    sec4 = section(4, struct.pack(">HH", 0, 0) + bytes([6, 1]) + bytes(24))

    if packing == "simple":
        drs = struct.pack(">IHfhhBB", n, 0, R, E, D, nbits, 0)
        data = pack_bits(X, nbits)
    elif packing == "png":
        import io as _io

        from PIL import Image

        if nbits <= 8:
            arr = X.reshape(nj, ni).astype(np.uint8)
        elif nbits <= 16:
            arr = X.reshape(nj, ni).astype(">u2")
        else:
            raise ValueError("test encoder: png supports <= 16 bits")
        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        drs = struct.pack(">IHfhhBB", n, 41, R, E, D,
                          8 if nbits <= 8 else 16, 0)
        data = buf.getvalue()
    elif packing == "complex":
        # one group, 2nd-order spatial differencing (template 5.3)
        d = X.copy()
        d[2:] = X[2:] - 2 * X[1:-1] + X[:-2]
        gmin = int(d[2:].min()) if n > 2 else 0
        packed = np.zeros(n, dtype=np.int64)
        packed[2:] = d[2:] - gmin
        gbits = max(int(packed.max()).bit_length(), 1)
        extra = 4

        def sm(v):  # sign-magnitude, 4 octets
            return struct.pack(">I", (0x80000000 | -v) if v < 0 else v)

        drs = (
            struct.pack(">IH", n, 3)
            + struct.pack(">fhhBB", R, E, D, gbits, 0)
            + bytes([1, 0])                       # splitting, missing mgmt
            + struct.pack(">II", 0, 0)            # missing substitutes
            + struct.pack(">I", 1)                # NG
            + bytes([0, 6])                       # width ref, width bits
            + struct.pack(">I", 0) + bytes([1])   # len ref, len inc
            + struct.pack(">I", n) + bytes([32])  # last len, len bits
            + bytes([2, extra])                   # order 2, extra octets
        )
        body = sm(int(X[0])) + sm(int(X[1])) + sm(gmin)
        body += pack_bits([0], gbits)             # group reference
        body += pack_bits([gbits], 6)             # group width (ref 0)
        body += pack_bits([n], 32)                # group length
        body += pack_bits(packed, gbits)
        data = body
    else:
        raise ValueError(packing)

    sec5 = section(5, drs)
    sec6 = section(6, bytes([255]))               # no bitmap
    sec7 = section(7, data)

    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    sec0 = b"GRIB" + bytes([0, 0, 209, 2]) + struct.pack(">Q", total)
    return sec0 + body + b"7777"
