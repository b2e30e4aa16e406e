"""Feature detection and thunderstorm tracking tests
(reference strategy: pysteps/tests/test_feature.py, test_tracking_tdating.py)."""

import numpy as np
import pytest

from pysteps_tpu.feature import blob, shitomasi, tstorm
from pysteps_tpu.tracking import tdating


def _storm_field(centers, shape=(128, 128), peak=50.0, scale=6.0):
    yy, xx = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]), indexing="ij")
    field = np.zeros(shape)
    for cy, cx in centers:
        field += peak * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * scale**2))
    return field


def test_shitomasi_finds_corners():
    rng = np.random.RandomState(0)
    field = rng.rand(64, 64) * 2
    field[20:40, 20:40] += 20.0  # strong square -> corners
    pts = shitomasi.detection(field, max_corners=20)
    assert pts.shape[1] == 2
    assert len(pts) > 0


def test_blob_detects_gaussians():
    field = _storm_field([(40, 40), (90, 80)], peak=30.0)
    out = blob.detection(field, max_num_features=10, threshold=1.0)
    assert out.shape[1] == 3
    found = out[:, :2]
    # both blobs found within a few pixels
    for cy, cx in [(40, 40), (90, 80)]:
        d = np.sqrt((found[:, 0] - cx) ** 2 + (found[:, 1] - cy) ** 2)
        assert d.min() < 5.0


def test_tstorm_detection():
    field = _storm_field([(40, 40), (90, 80)], peak=50.0)
    cells, labels = tstorm.detection(field, minref=35, minmax=41, minsize=10)
    assert len(cells) == 2
    assert set(np.unique(labels)) - {0.0} == {1.0, 2.0}
    cens = np.stack([cells.cen_x.to_numpy(), cells.cen_y.to_numpy()], axis=1)
    for cy, cx in [(40, 40), (90, 80)]:
        d = np.sqrt((cens[:, 0] - cx) ** 2 + (cens[:, 1] - cy) ** 2)
        assert d.min() < 5.0


def test_tstorm_no_storms():
    field = np.zeros((64, 64))
    cells, labels = tstorm.detection(field, minref=35)
    assert len(cells) == 0


def test_tdating_tracks_moving_storm():
    frames = []
    times = []
    for t in range(5):
        frames.append(
            _storm_field([(40 + 3 * t, 40 + 5 * t)], shape=(128, 128), peak=50.0)
        )
        times.append(f"t{t}")
    video = np.stack(frames)
    tracks, cells, labels = tdating.dating(video, times, mintrack=2, minsize=10)
    assert len(tracks) >= 1
    # the longest track follows the storm over at least 2 steps
    assert max(len(t) for t in tracks) >= 2
