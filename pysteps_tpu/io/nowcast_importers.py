"""
Re-import framework-written forecasts
(reference: pysteps/io/nowcast_importers.py:85).
"""

import numpy as np

from pysteps_tpu.exceptions import DataModelError


def import_netcdf_pysteps(filename, onerror="warn", **kwargs):
    """Import a forecast written by the HDF5/NPZ exporters
    (the reference reads its own NetCDF; same content here)."""
    try:
        if filename.endswith(".npz"):
            data = np.load(filename, allow_pickle=True)
            precip = data["precip_forecast"]
            metadata = (
                data["metadata"].item() if "metadata" in data.files else {}
            )
            return precip, metadata
        import h5py

        with h5py.File(filename, "r") as f:
            precip = f["precip_forecast"][...]
            metadata = dict(f["metadata"].attrs) if "metadata" in f else {}
        return precip, metadata
    except (OSError, KeyError) as err:
        if onerror == "warn":
            print(f"error importing {filename}: {err}")
            return None, None
        raise DataModelError(str(err)) from err
