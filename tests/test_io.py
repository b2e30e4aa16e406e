"""IO round-trip tests (reference strategy: pysteps/tests/test_io_*.py,
test_exporters.py) using synthetic files written to tmp_path."""

import datetime
import gzip
import os
import re

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
        importers.import_mch_metranet("nonexistent.gif")


@pytest.mark.parametrize("packing", ["simple", "png", "complex"])
def test_grib2_roundtrip(tmp_path, packing):
    from helpers import encode_grib2

    from pysteps_tpu.io import _grib2

    rng = np.random.RandomState(0)
    field = np.round(rng.exponential(2.0, (40, 60)), 3)
    field[3, 7] = -3.0
    path = tmp_path / f"test_{packing}.grib2"
    path.write_bytes(encode_grib2(field, packing=packing))
    msg = _grib2.read_messages(str(path))[0]
    assert msg.values.shape == field.shape
    np.testing.assert_allclose(msg.values, field, atol=2e-3)
    assert msg.ni == 60 and msg.nj == 40
    assert msg.projparams["proj"] == "longlat"


def test_grib2_numpy_fallback_matches_native(tmp_path, monkeypatch):
    from helpers import encode_grib2

    import pysteps_tpu.native as native
    from pysteps_tpu.io import _grib2

    rng = np.random.RandomState(1)
    field = np.round(rng.exponential(1.0, (16, 24)), 3)
    for packing in ("simple", "png", "complex"):
        path = tmp_path / f"fb_{packing}.grib2"
        path.write_bytes(encode_grib2(field, packing=packing))
        native_vals = _grib2.read_messages(str(path))[0].values
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        fallback_vals = _grib2.read_messages(str(path))[0].values
        monkeypatch.undo()
        np.testing.assert_allclose(native_vals, fallback_vals, atol=1e-6)


def test_import_mrms_grib(tmp_path):
    import gzip

    from helpers import encode_grib2

    rng = np.random.RandomState(2)
    field = np.round(rng.exponential(2.0, (40, 60)), 3)
    field[0, :5] = -3.0  # MRMS no-coverage sentinel
    path = tmp_path / "PrecipRate_00.00.grib2.gz"
    with gzip.open(path, "wb") as f:
        f.write(encode_grib2(field, packing="png"))

    precip, quality, meta = importers.import_mrms_grib(str(path), window_size=2)
    assert precip.shape == (20, 30)
    assert np.isnan(precip[0, :3]).all()  # no-coverage poisons its block
    assert meta["unit"] == "mm/h" and meta["yorigin"] == "upper"
    assert meta["projection"].startswith("+proj=longlat")

    full, _, _ = importers.import_mrms_grib(str(path), window_size=1)
    assert full.shape == field.shape
    ok = field != -3.0
    np.testing.assert_allclose(full[ok], field[ok], atol=2e-3)

    sub, _, meta_sub = importers.import_mrms_grib(
        str(path), window_size=1, extent=(230.1, 230.4, 20.05, 20.3)
    )
    assert sub.shape[0] < field.shape[0] and sub.shape[1] < field.shape[1]


def test_import_bom_rf3(tmp_path):
    from scipy.io import netcdf_file

    path = str(tmp_path / "bom.nc")
    f = netcdf_file(path, "w")
    f.createDimension("x", 8)
    f.createDimension("y", 8)
    f.createDimension("t", 1)
    x = f.createVariable("x", "f4", ("x",))
    x[:] = np.arange(8) * 2.0
    x.units, x.valid_min, x.valid_max = b"km", 0.0, 14.0
    y = f.createVariable("y", "f4", ("y",))
    y[:] = np.arange(8) * 2.0
    y.units, y.valid_min, y.valid_max = b"km", 0.0, 14.0
    pr = f.createVariable("precipitation", "f4", ("y", "x"))
    pr[:] = np.random.RandomState(0).exponential(1, (8, 8)).astype("f4")
    pr.units = b"kg m-2"
    proj = f.createVariable("proj", "i4", ())
    proj.grid_mapping_name = b"albers_conical_equal_area"
    proj.longitude_of_central_meridian = 144.75
    proj.latitude_of_projection_origin = -37.85
    proj.standard_parallel = np.array([-18.0, -36.0])
    vt = f.createVariable("valid_time", "i4", ("t",))
    vt[:] = [600]
    vt.units = b"seconds since 2020-01-01 00:00:00"
    st = f.createVariable("start_time", "i4", ("t",))
    st[:] = [300]
    st.units = b"seconds since 2020-01-01 00:00:00"
    f.close()

    precip, quality, meta = importers.import_bom_rf3(path)
    assert precip.shape == (8, 8)
    assert meta["unit"] == "mm" and meta["accutime"] == 5
    assert meta["projection"].startswith("+proj=aea")
    assert meta["x2"] == 14000.0 and meta["xpixelsize"] == 2000.0


def test_import_saf_crri(tmp_path):
    h5py = pytest.importorskip("h5py")

    path = str(tmp_path / "saf.nc")
    with h5py.File(path, "w") as h:
        h.attrs["gdal_projection"] = np.bytes_("+proj=geos +h=35785831")
        h.attrs["institution"] = np.bytes_("EUMETSAT NWC SAF")
        h.attrs["gdal_geotransform_table"] = np.array(
            [0.0, 3000.0, 0.0, 0.0, 0.0, -3000.0]
        )
        h.attrs["gdal_xgeo_up_left"] = -100000.0
        h.attrs["gdal_xgeo_low_right"] = 100000.0
        h.attrs["gdal_ygeo_up_left"] = 100000.0
        h.attrs["gdal_ygeo_low_right"] = -100000.0
        data = np.random.RandomState(1).randint(0, 50, (64, 64)).astype("u2")
        data[0, 0] = 65535  # nodata sentinel
        d = h.create_dataset("crr_intensity", data=data)
        d.attrs["units"] = np.bytes_("mm/h")
        h.create_dataset("crr_quality", data=np.full((64, 64), 8, "u1"))

    precip, quality, meta = importers.import_saf_crri(path)
    assert precip.shape == (64, 64) and np.isnan(precip[0, 0])
    assert quality is not None and meta["institution"] == "EUMETSAT NWC SAF"

    sub, qsub, msub = importers.import_saf_crri(
        path, extent=(-50000, 50000, -50000, 50000)
    )
    assert sub.shape[0] < 64 and qsub.shape == sub.shape
    assert msub["x1"] >= -50000 - 3000


def test_import_fmi_geotiff(tmp_path):
    from PIL import Image, TiffImagePlugin

    path = str(tmp_path / "fmi.tif")
    arr = np.random.RandomState(2).randint(0, 255, (32, 32)).astype(np.uint8)
    arr[5, 5] = 255  # nodata
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[33550] = (1000.0, 1000.0, 0.0)  # ModelPixelScale
    info[33922] = (0.0, 0.0, 0.0, 100000.0, 7800000.0, 0.0)  # ModelTiepoint
    info[34735] = tuple(
        np.array([1, 1, 0, 1, 3072, 0, 1, 3067], dtype=np.int16).tolist()
    )  # GeoKeyDirectory with EPSG 3067
    Image.fromarray(arr).save(path, tiffinfo=info)

    precip, quality, meta = importers.import_fmi_geotiff(path)
    assert precip.shape == (32, 32) and np.isnan(precip[5, 5])
    # dBZ convention (raw - 64) / 2
    assert np.isclose(precip[0, 0], (arr[0, 0] - 64.0) / 2.0)
    assert meta["x1"] == 100000.0 and meta["y2"] == 7800000.0
    assert meta["projection"].startswith("+proj=utm +zone=35")
    assert meta["transform"] == "dB"


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


# ---------------------------------------------------------------------------
# CF-1.7 NetCDF exporter (h5py-backed) + projections + GeoTIFF writer


_NC_META = {
    "projection": (
        "+proj=stere +lon_0=25 +lat_0=90 +lat_ts=60 +a=6371288"
        " +x_0=380886.31 +y_0=3395677.92"
    ),
    "x1": 0.0, "x2": 512000.0, "y1": 0.0, "y2": 256000.0,
    "yorigin": "upper", "unit": "mm/h", "cartesian_unit": "m",
}


@pytest.mark.parametrize("incremental", [None, "timestep", "member"])
def test_netcdf_exporter_roundtrip(tmp_path, incremental):
    from pysteps_tpu.io import nowcast_importers

    start = datetime.datetime(2026, 8, 18, 12, 0)
    F = np.random.RandomState(0).gamma(1.0, 2.0, (3, 4, 32, 64)).astype(np.float32)
    kwargs = {"incremental": incremental}
    if incremental != "member":
        kwargs["n_ens_members"] = 3
    exp = exporters.initialize_forecast_exporter_netcdf(
        str(tmp_path), "fc", start, 5, 4, (32, 64), _NC_META, **kwargs
    )
    if incremental is None:
        exporters.export_forecast_dataset(F, exp)
    elif incremental == "timestep":
        for t in range(4):
            exporters.export_forecast_dataset(F[:, t], exp)
    else:
        for j in range(3):
            exporters.export_forecast_dataset(F[j], exp)
    exporters.close_forecast_files(exp)

    precip, meta = nowcast_importers.import_netcdf_pysteps(
        str(tmp_path / "fc.nc"), onerror="raise"
    )
    np.testing.assert_allclose(precip, F, atol=1e-5)
    assert meta["unit"] == "mm/h"
    np.testing.assert_allclose(meta["leadtimes"], [5, 10, 15, 20])
    # grid mapping -> proj4 reconstruction keeps the projection family
    assert "+proj=stere" in meta["projection"]
    assert meta["x1"] == pytest.approx(0.0)
    assert meta["x2"] == pytest.approx(512000.0)


def test_kineros_exporter_per_element(tmp_path):
    start = datetime.datetime(2026, 8, 18, 12, 0)
    F = np.random.RandomState(3).gamma(1.0, 2.0, (2, 3, 4, 4)).astype(np.float32)
    exp = exporters.initialize_forecast_exporter_kineros(
        str(tmp_path), "kin", start, 5, 3, (4, 4), _NC_META, n_ens_members=2
    )
    exporters.export_forecast_dataset(F, exp)
    exporters.close_forecast_files(exp)

    # one file per member, one RG block per grid point, one line per lead
    for n in range(2):
        text = (tmp_path / f"kin_N{n:02d}.pre").read_text()
        assert text.count("BEGIN RG") == 16
        assert "BEGIN RG016" in text
        assert "TIME        INTENSITY" in text
        # first gauge of member n carries the raw series at (0, 0)
        block = text.split("BEGIN RG001\n")[1].split("END")[0]
        lines = [ln for ln in block.splitlines() if re.match(r"\s*\d", ln)]
        vals = [float(ln.split()[1]) for ln in lines]
        np.testing.assert_allclose(vals, F[n, :, 0, 0], atol=0.01)

    # unit mm -> cumulative DEPTH series
    exp = exporters.initialize_forecast_exporter_kineros(
        str(tmp_path), "kin_mm", start, 5, 3, (4, 4), _NC_META | {"unit": "mm"},
        n_ens_members=1,
    )
    exporters.export_forecast_dataset(F[:1], exp)
    exporters.close_forecast_files(exp)
    text = (tmp_path / "kin_mm_N00.pre").read_text()
    assert "TIME        DEPTH" in text
    block = text.split("BEGIN RG001\n")[1].split("END")[0]
    lines = [ln for ln in block.splitlines() if re.match(r"\s*\d", ln)]
    vals = [float(ln.split()[1]) for ln in lines]
    np.testing.assert_allclose(vals, np.cumsum(F[0, :, 0, 0]), atol=0.01)


def test_netcdf_exporter_packing(tmp_path):
    from pysteps_tpu.io import nowcast_importers

    start = datetime.datetime(2026, 8, 18, 12, 0)
    F = np.random.RandomState(1).gamma(1.0, 2.0, (1, 4, 16, 16)).astype(np.float32)
    exp = exporters.initialize_forecast_exporter_netcdf(
        str(tmp_path), "fcp", start, 5, 4, (16, 16), _NC_META,
        datatype=np.int16, scale_factor=0.01, fill_value=-9999,
    )
    exporters.export_forecast_dataset(F[0], exp)
    exporters.close_forecast_files(exp)
    precip, _ = nowcast_importers.import_netcdf_pysteps(
        str(tmp_path / "fcp.nc"), onerror="raise"
    )
    assert np.abs(precip - F[0]).max() < 0.0051


def test_geotiff_exporter(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    start = datetime.datetime(2026, 8, 18, 12, 0)
    F = np.random.RandomState(2).gamma(1.0, 2.0, (1, 2, 16, 32)).astype(np.float32)
    exp = exporters.initialize_forecast_exporter_geotiff(
        str(tmp_path), "gt", start, 5, 2, (16, 32), _NC_META, n_ens_members=1
    )
    exporters.export_forecast_dataset(F, exp)
    exporters.close_forecast_files(exp)
    fns = sorted(tmp_path.glob("gt_*.tif"))
    assert len(fns) == 2
    im = Image.open(fns[0])
    np.testing.assert_allclose(np.array(im), F[0, 0], atol=1e-6)
    # georeferencing tags: pixel scale and upper-left tiepoint
    assert im.tag_v2[33550][0] == pytest.approx(512000.0 / 32)
    assert im.tag_v2[33922][3:5] == (0.0, 256000.0)
    assert "+proj=stere" in im.tag_v2[34737]


def test_projection_roundtrips():
    from pysteps_tpu.utils.projection import Proj

    cases = [
        ("+proj=stere +lat_0=90 +lon_0=25 +lat_ts=60 +a=6371288", (19.1, 59.7)),
        ("+proj=aea +lon_0=144.75 +lat_0=-37.85 +lat_1=-18 +lat_2=-36 +ellps=GRS80",
         (145.0, -37.0)),
        ("+proj=merc +lon_0=0 +lat_ts=0 +ellps=WGS84", (10.0, 50.0)),
        ("+proj=utm +zone=33 +ellps=WGS84", (14.0, 46.0)),
        ("+proj=somerc +lat_0=46.9524055555 +lon_0=7.4395833333 +k_0=1"
         " +x_0=600000 +y_0=200000 +ellps=bessel", (8.2, 46.8)),
        ("+proj=aeqd +lon_0=10 +lat_0=50 +R=6371000", (12.0, 52.0)),
        ("+proj=laea +lat_0=55 +lon_0=10 +x_0=1950000 +y_0=-2100000"
         " +ellps=WGS84", (2.0, 48.0)),
        ("+proj=longlat +ellps=WGS84", (2.0, 48.0)),
    ]
    for proj4, (lon, lat) in cases:
        proj = Proj(proj4)
        x, y = proj(lon, lat)
        lon2, lat2 = proj(x, y, inverse=True)
        assert lon2 == pytest.approx(lon, abs=1e-7), proj4
        assert lat2 == pytest.approx(lat, abs=1e-7), proj4


def test_projection_somerc_swisstopo_constants():
    # the four published swisstopo CH1903/LV03 projection constants
    import math

    from pysteps_tpu.utils.projection import Proj

    impl = Proj(
        "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333"
        " +k_0=1 +x_0=600000 +y_0=200000 +ellps=bessel"
    )._impl
    assert impl.alpha == pytest.approx(1.00072913843038, abs=1e-11)
    assert impl.R == pytest.approx(6378815.90, abs=0.01)
    assert math.degrees(impl.b0) == pytest.approx(46.9077314, abs=1e-6)
    assert impl.K == pytest.approx(0.0030667323772751, abs=1e-9)
    # projection centre maps to the false origin
    x, y = impl.forward(7.439583333333333, 46.95240555555556)
    assert x == pytest.approx(600000.0, abs=1e-6)
    assert y == pytest.approx(200000.0, abs=1e-6)


def test_projection_utm_known_points():
    from pysteps_tpu.utils.projection import Proj

    utm = Proj("+proj=utm +zone=33 +ellps=WGS84")
    x, y = utm(15.0, 0.0)
    assert x == pytest.approx(500000.0, abs=1e-6)
    assert y == pytest.approx(0.0, abs=1e-6)
    # scaled meridian arc at 45N (0.9996 * M(45))
    _, y45 = utm(15.0, 45.0)
    assert y45 == pytest.approx(4982950.40, abs=0.5)


def _write_odim_file(path, what_defaults="opera", with_quality=True,
                     with_times=False):
    """Synthetic ODIM HDF5 composite with a RATE dataset and (optionally)
    a QIND quality dataset."""
    import h5py

    rng = np.random.RandomState(3)
    raw = rng.randint(1, 250, (32, 40)).astype("u1")
    raw[0, :5] = 255   # nodata (opera convention)
    raw[1, :5] = 0     # undetect
    qraw = rng.randint(1, 250, (32, 40)).astype("u1")
    with h5py.File(path, "w") as f:
        where = f.create_group("where")
        where.attrs["projdef"] = np.bytes_(
            b"+proj=stere +lon_0=10 +lat_0=90 +lat_ts=60 +a=6378137 "
            b"+b=6356752.3 +x_0=0 +y_0=0"
        )
        for k, v in [("LL_lat", 45.0), ("LL_lon", 2.0), ("UR_lat", 55.0),
                     ("UR_lon", 20.0), ("xscale", 2000.0),
                     ("yscale", 2000.0)]:
            where.attrs[k] = v
        what = f.create_group("what")
        what.attrs["source"] = np.bytes_(b"ORG:dwd")
        ds = f.create_group("dataset1")
        dwhat = ds.create_group("what")
        if with_times:
            dwhat.attrs["startdate"] = np.bytes_(b"20260821")
            dwhat.attrs["starttime"] = np.bytes_(b"120000")
            dwhat.attrs["enddate"] = np.bytes_(b"20260821")
            dwhat.attrs["endtime"] = np.bytes_(b"121500")
        d1 = ds.create_group("data1")
        w1 = d1.create_group("what")
        w1.attrs["quantity"] = np.bytes_(b"RATE")
        w1.attrs["gain"] = 0.1
        w1.attrs["offset"] = 0.0
        if what_defaults == "mch":
            w1.attrs["nodata"] = 0.0
            w1.attrs["undetect"] = 251.0
            raw2 = raw.copy()
            raw2[0, :5] = 0
            raw2[1, :5] = 251
            d1.create_dataset("data", data=raw2)
        else:
            w1.attrs["nodata"] = 255.0
            w1.attrs["undetect"] = 0.0
            d1.create_dataset("data", data=raw)
        if with_quality:
            d2 = ds.create_group("data2")
            w2 = d2.create_group("what")
            w2.attrs["quantity"] = np.bytes_(b"QIND")
            w2.attrs["gain"] = 1.0
            w2.attrs["offset"] = 0.0
            w2.attrs["nodata"] = 255.0
            w2.attrs["undetect"] = 0.0
            d2.create_dataset("data", data=qraw)
    return raw, qraw


def test_odim_hdf5_quality_field(tmp_path):
    pytest.importorskip("h5py")
    path = str(tmp_path / "odim.h5")
    _write_odim_file(path)
    precip, quality, meta = importers.import_odim_hdf5(path)
    assert quality is not None and quality.shape == precip.shape
    assert np.isfinite(quality).sum() > 0
    assert meta["accutime"] == 15.0
    assert meta["institution"] == "Odyssey datacentre"
    # corners reprojected from the lon/lat attributes (not raw LL_x)
    assert meta["x2"] > meta["x1"] and meta["y2"] > meta["y1"]
    assert meta["xpixelsize"] == 2000.0
    # undetect pixels map to the offset, nodata to NaN
    assert np.isnan(precip[0, 0]) and precip[1, 0] == 0.0


def test_mch_hdf5_distinct_decoder(tmp_path):
    pytest.importorskip("h5py")
    path = str(tmp_path / "mch.h5")
    _write_odim_file(path, what_defaults="mch")
    precip, quality, meta = importers.import_mch_hdf5(path)
    assert quality is not None
    assert meta["institution"] == "MeteoSwiss"
    assert meta["zr_a"] == 316.0 and meta["zr_b"] == 1.5
    # the Swiss CCS4 geodata, not the file's where attrs
    assert meta["x1"] == 255000.0 and meta["y2"] == 480000.0
    # MCH semantics: undetect -> NaN (not offset)
    assert np.isnan(precip[1, 0]) and np.isnan(precip[0, 0])


def test_dwd_hdf5_accutime_from_file(tmp_path):
    pytest.importorskip("h5py")
    path = str(tmp_path / "dwd.h5")
    _write_odim_file(path, with_times=True)
    precip, quality, meta = importers.import_dwd_hdf5(path)
    assert meta["accutime"] == 15.0  # from start/end timestamps
    assert meta["institution"] == "ORG:dwd"
    assert quality is not None


def test_odim_contract_matches_reference(tmp_path):
    """(precip, quality, metadata) contract diffed against the imported
    reference importer on the same synthetic file (VERDICT r2 task 8).
    The reference needs pyproj for the corner reprojection; our
    pyproj-compatible Proj facade stands in for it."""
    pytest.importorskip("h5py")
    import sys
    import types

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from benchtools import import_reference_pysteps
    from pysteps_tpu.utils import projection as proj_mod

    if "pyproj" not in sys.modules:
        shim = types.ModuleType("pyproj")
        shim.Proj = proj_mod.Proj
        sys.modules["pyproj"] = shim
    ref = import_reference_pysteps()
    if ref is None:
        pytest.skip("reference pysteps unavailable")
    path = str(tmp_path / "odim.h5")
    _write_odim_file(path)
    from pysteps.io import importers as ref_importers

    ref_importers.PYPROJ_IMPORTED = True
    ref_importers.pyproj = sys.modules["pyproj"]
    p_ref, q_ref, m_ref = ref_importers.import_odim_hdf5(path)
    p_my, q_my, m_my = importers.import_odim_hdf5(path)
    np.testing.assert_allclose(
        np.asarray(p_my, float), p_ref, equal_nan=True, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(q_my, float), q_ref, equal_nan=True, atol=1e-6
    )
    for key in ("projection", "x1", "y1", "x2", "y2", "xpixelsize",
                "ypixelsize", "cartesian_unit", "yorigin", "unit",
                "transform", "accutime", "institution"):
        assert key in m_my, key
        if isinstance(m_ref.get(key), float):
            assert abs(m_my[key] - m_ref[key]) < max(1e-6 * abs(m_ref[key]), 1e-6), key
        elif key in m_ref:
            assert m_my[key] == m_ref[key], key
