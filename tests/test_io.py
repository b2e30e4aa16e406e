"""IO round-trip tests (reference strategy: pysteps/tests/test_io_*.py,
test_exporters.py) using synthetic files written to tmp_path."""

import datetime
import gzip
import os

import numpy as np
import pytest

from pysteps_tpu import io as io_module
from pysteps_tpu.io import archive, exporters, importers, readers


def _write_pgm(path, data, gzipped=False):
    header = f"P5\n# missingvalue 255\n{data.shape[1]} {data.shape[0]}\n255\n"
    payload = header.encode() + data.astype(np.uint8).tobytes()
    if gzipped:
        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


def test_fmi_pgm_roundtrip(tmp_path):
    data = np.random.RandomState(0).randint(64, 200, (32, 32))
    path = str(tmp_path / "test.pgm")
    _write_pgm(path, data)
    precip, quality, meta = importers.import_fmi_pgm(path)
    assert precip.shape == (32, 32)
    assert meta["unit"] == "dBZ"
    np.testing.assert_allclose(precip[0, 0], (data[0, 0] - 64.0) / 2.0)


def test_odim_hdf5_roundtrip(tmp_path):
    import h5py

    path = str(tmp_path / "odim.h5")
    rng = np.random.RandomState(1)
    raw = rng.randint(1, 200, (64, 64)).astype(np.uint8)
    with h5py.File(path, "w") as f:
        grp = f.create_group("dataset1")
        d1 = grp.create_group("data1")
        d1.create_dataset("data", data=raw)
        what = d1.create_group("what")
        what.attrs["quantity"] = b"RATE"
        what.attrs["gain"] = 0.5
        what.attrs["offset"] = 0.0
        what.attrs["nodata"] = 255.0
        what.attrs["undetect"] = 0.0
        where = f.create_group("where")
        where.attrs["xscale"] = 1000.0
        where.attrs["yscale"] = 1000.0
    precip, _, meta = importers.import_odim_hdf5(path)
    assert precip.shape == (64, 64)
    np.testing.assert_allclose(precip[0, 0], raw[0, 0] * 0.5)
    assert meta["unit"] == "mm/h"


def test_npz_exporter_importer_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    field = rng.rand(2, 3, 16, 16).astype(np.float32)
    meta = {"unit": "mm/h", "transform": None}
    exp = exporters.initialize_forecast_exporter_npz(
        str(tmp_path), "fc", datetime.datetime(2026, 8, 17), 5, 3, (16, 16),
        meta, n_ens_members=2,
    )
    exporters.export_forecast_dataset(field, exp)
    exporters.close_forecast_files(exp)
    from pysteps_tpu.io.nowcast_importers import import_netcdf_pysteps

    out, meta2 = import_netcdf_pysteps(str(tmp_path / "fc.npz"))
    np.testing.assert_allclose(out, field)


def test_hdf5_exporter_incremental_timestep(tmp_path):
    import h5py

    exp = exporters.initialize_forecast_exporter_hdf5(
        str(tmp_path), "fc", datetime.datetime(2026, 8, 17), 5, 3, (8, 8),
        {"unit": "mm/h"}, n_ens_members=2, incremental="timestep",
    )
    rng = np.random.RandomState(3)
    blocks = [rng.rand(2, 8, 8).astype(np.float32) for _ in range(3)]
    for b in blocks:
        exporters.export_forecast_dataset(b, exp)
    exporters.close_forecast_files(exp)
    with h5py.File(str(tmp_path / "fc.h5")) as f:
        out = f["precip_forecast"][...]
    for t in range(3):
        np.testing.assert_allclose(out[:, t], blocks[t])


def test_archive_find_by_date(tmp_path):
    root = tmp_path / "archive"
    sub = root / "2026" / "08" / "17"
    sub.mkdir(parents=True)
    date = datetime.datetime(2026, 8, 17, 12, 0)
    for minutes in (-5, 0):
        t = date + datetime.timedelta(minutes=minutes)
        (sub / (t.strftime("%Y%m%d%H%M") + ".pgm")).write_bytes(b"x")
    fns, times = archive.find_by_date(
        date, str(root), "%Y/%m/%d", "%Y%m%d%H%M", "pgm", 5,
        num_prev_files=2, silent=True,
    )
    assert len(fns) == 3
    assert fns[0] is None  # -10 min missing
    assert fns[1] is not None and fns[2] is not None


def test_read_timeseries_fills_missing(tmp_path):
    data = np.random.RandomState(4).randint(64, 200, (16, 16))
    p1 = str(tmp_path / "a.pgm")
    _write_pgm(p1, data)
    precip, _, meta = readers.read_timeseries(
        ([None, p1], [datetime.datetime(2026, 8, 17, 11, 55),
                      datetime.datetime(2026, 8, 17, 12, 0)]),
        importers.import_fmi_pgm,
    )
    assert precip.shape == (2, 16, 16)
    assert np.all(np.isnan(precip[0]))
    assert np.all(np.isfinite(precip[1]))


def test_interface():
    assert io_module.get_method("fmi_pgm", "importer") is not None
    assert io_module.get_method("hdf5", "exporter") is not None
    with pytest.raises(ValueError):
        io_module.get_method("nonexistent", "importer")


def test_gated_importers_raise():
    from pysteps_tpu.exceptions import MissingOptionalDependency

    with pytest.raises(MissingOptionalDependency):
        importers.import_mrms_grib("nonexistent.grib2")


def test_native_radolan_decoder_matches_numpy():
    from pysteps_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 4096, (900 * 900,), dtype=np.uint16)
    raw[::97] |= 0x2000
    out = native.radolan_decode(raw, 900)
    arr = raw.reshape(900, 900)
    ref = np.where((arr & 0x2000) > 0, np.nan, (arr & 0x0FFF) * 0.1)[::-1]
    np.testing.assert_allclose(out, ref, rtol=1e-5, equal_nan=True)


def test_native_calibrate_u16():
    from pysteps_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    raw = np.array([0, 10, 255, 65535], dtype=np.uint16)
    out = native.calibrate_u16(raw, 0.5, 1.0, 65535, 0, undetect_value=-1.0)
    np.testing.assert_allclose(out[:3], [-1.0, 6.0, 128.5])
    assert np.isnan(out[3])
