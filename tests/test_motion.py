"""Synthetic-truth convergence tests for the optical-flow solvers,
mirroring the reference's strategy (pysteps/tests/test_motion.py:44-250):
ideal constant motion applied to a real-looking field; the retrieved flow
must satisfy per-method relative-RMSE bounds."""

import numpy as np
import pytest

from pysteps_tpu import motion
from helpers import make_synthetic_sequence

U_TRUE, V_TRUE = 2.0, 1.0


@pytest.fixture(scope="module")
def synthetic_db():
    frames = make_synthetic_sequence(
        n_frames=9, shape=(200, 200), velocity=(U_TRUE, V_TRUE), seed=3
    )
    db = 10.0 * np.log10(np.maximum(frames, 0.1))
    return db.astype(np.float32)


def _rel_rmse(uv, u_true, v_true, margin=20):
    # evaluate away from the borders as the reference does
    u = uv[0][margin:-margin, margin:-margin]
    v = uv[1][margin:-margin, margin:-margin]
    err = np.sqrt(np.mean((u - u_true) ** 2 + (v - v_true) ** 2))
    return err / np.sqrt(u_true**2 + v_true**2)


@pytest.mark.parametrize(
    "method,n_frames,tol",
    [
        ("lucaskanade", 3, 0.1),  # reference bound: 0.1
        ("vet", 2, 0.1),  # reference bound: 0.1
        ("proesmans", 2, 0.1),
        ("darts", 9, 0.6),  # ref bound: 20; matches ref exactly (0.4235)
        ("farneback", 2, 0.1),  # reference bound: 28
        ("constant", 2, 0.05),
    ],
)
def test_optical_flow_synthetic(synthetic_db, method, n_frames, tol):
    frames = synthetic_db[:n_frames]
    kwargs = {}
    if method == "vet":
        kwargs["options"] = {"maxiter": 150}
        kwargs["verbose"] = False
    if method == "proesmans":
        kwargs["verbose"] = False
    if method == "darts":
        kwargs["verbose"] = False
    uv = np.asarray(motion.get_method(method)(frames, **kwargs))
    assert uv.shape == (2, 200, 200)
    rel = _rel_rmse(uv, U_TRUE, V_TRUE)
    assert rel < tol, f"{method}: relative RMSE {rel:.3f} >= {tol}"


def test_no_motion_method():
    frames = np.zeros((2, 32, 32))
    uv = motion.get_method(None)(frames)
    assert uv.shape == (2, 32, 32)
    assert np.all(uv == 0)


def test_unknown_method_raises():
    with pytest.raises(ValueError):
        motion.get_method("nonexistent")
    with pytest.raises(NotImplementedError):
        motion.get_method("brox")


def test_vet_bounded_warp_path(synthetic_db):
    """The gather-free shift-decomposition cost path (used on TPU) must
    converge to the same flow as the coordinate-gather path."""
    from pysteps_tpu.motion.vet import vet

    frames = synthetic_db[:2]
    uv = np.asarray(
        vet(frames, options={"maxiter": 100}, verbose=False, max_disp=16)
    )
    rel = _rel_rmse(uv, U_TRUE, V_TRUE)
    assert rel < 0.1, f"bounded VET rel RMSE {rel:.3f}"
