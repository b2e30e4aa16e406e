"""Array helpers (reference: pysteps/utils/arrays.py:16)."""

import numpy as np


def compute_centred_coord_array(M, N):
    """Compute 2-D coordinate arrays with the origin at the centre.

    Returns (yc, xc) broadcastable to (M, N); mirrors the reference's
    open-grid semantics (pysteps/utils/arrays.py:16).
    """
    if M % 2 == 1:
        s1 = np.s_[-int(M / 2) : int(M / 2) + 1]
    else:
        s1 = np.s_[-int(M / 2) : int(M / 2)]
    if N % 2 == 1:
        s2 = np.s_[-int(N / 2) : int(N / 2) + 1]
    else:
        s2 = np.s_[-int(N / 2) : int(N / 2)]
    yc, xc = np.ogrid[s1, s2]
    return yc, xc
