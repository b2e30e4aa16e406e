"""
Forecast exporters (reference: pysteps/io/exporters.py:125,241,370,666,753).

Stateful exporter dicts with the reference's three-call protocol:
``initialize_forecast_exporter_xxx`` -> ``export_forecast_dataset`` ->
``close_forecast_files``.  Incremental writing modes ("timestep" /
"member") are supported.

Backends: HDF5 (h5py; replaces the reference's CF-NetCDF writer, which
needs netCDF4), NPZ (self-contained numpy), GeoTIFF (gated on GDAL), and
Kineros2 text.
"""

import os

import numpy as np

from pysteps_tpu.exceptions import MissingOptionalDependency


def initialize_forecast_exporter_hdf5(
    outpath, outfnprefix, startdate, timestep, n_timesteps, shape, metadata,
    n_ens_members=1, datatype=np.float32, incremental=None, **kwargs,
):
    """HDF5 exporter (stands in for the reference's CF-1.7 NetCDF exporter,
    io/exporters.py:370)."""
    import h5py

    if incremental not in (None, "timestep", "member"):
        raise ValueError(f"unknown incremental mode {incremental}")
    os.makedirs(outpath, exist_ok=True)
    fname = os.path.join(outpath, f"{outfnprefix}.h5")
    f = h5py.File(fname, "w")
    dset = f.create_dataset(
        "precip_forecast",
        shape=(n_ens_members, n_timesteps) + tuple(shape),
        dtype=datatype,
        compression="gzip",
        compression_opts=1,
    )
    meta_grp = f.create_group("metadata")
    for key, val in (metadata or {}).items():
        try:
            meta_grp.attrs[key] = val if val is not None else "None"
        except TypeError:
            meta_grp.attrs[key] = str(val)
    meta_grp.attrs["startdate"] = str(startdate)
    meta_grp.attrs["timestep"] = timestep

    return {
        "method": "hdf5",
        "file": f,
        "dataset": dset,
        "num_timesteps": n_timesteps,
        "num_ens_members": n_ens_members,
        "shape": tuple(shape),
        "metadata": metadata,
        "incremental": incremental,
        "timestep_index": 0,
        "member_index": 0,
    }


def initialize_forecast_exporter_netcdf(*args, **kwargs):
    """NetCDF exporter (reference: io/exporters.py:370).  netCDF4 is not an
    available dependency; the HDF5 exporter stores the same content."""
    raise MissingOptionalDependency(
        "netCDF4 is not available; use initialize_forecast_exporter_hdf5"
    )


def initialize_forecast_exporter_npz(
    outpath, outfnprefix, startdate, timestep, n_timesteps, shape, metadata,
    n_ens_members=1, datatype=np.float32, incremental=None, **kwargs,
):
    """NPZ exporter: buffers in memory, writes one compressed file."""
    if incremental not in (None, "timestep", "member"):
        raise ValueError(f"unknown incremental mode {incremental}")
    os.makedirs(outpath, exist_ok=True)
    return {
        "method": "npz",
        "fname": os.path.join(outpath, f"{outfnprefix}.npz"),
        "buffer": np.full(
            (n_ens_members, n_timesteps) + tuple(shape), np.nan, dtype=datatype
        ),
        "num_timesteps": n_timesteps,
        "num_ens_members": n_ens_members,
        "shape": tuple(shape),
        "metadata": metadata,
        "startdate": startdate,
        "timestep": timestep,
        "incremental": incremental,
        "timestep_index": 0,
        "member_index": 0,
    }


def initialize_forecast_exporter_geotiff(*args, **kwargs):
    """GeoTIFF exporter (reference: io/exporters.py:125) — requires GDAL."""
    raise MissingOptionalDependency("GDAL is required for the GeoTIFF exporter")


def initialize_forecast_exporter_kineros(
    outpath, outfnprefix, startdate, timestep, n_timesteps, shape, metadata,
    n_ens_members=1, **kwargs,
):
    """Kineros2 rainfall-input text exporter (reference: io/exporters.py:241)."""
    os.makedirs(outpath, exist_ok=True)
    return {
        "method": "kineros",
        "outpath": outpath,
        "outfnprefix": outfnprefix,
        "num_timesteps": n_timesteps,
        "num_ens_members": n_ens_members,
        "shape": tuple(shape),
        "metadata": metadata,
        "timestep": timestep,
        "fields": [],
        "incremental": None,
        "timestep_index": 0,
        "member_index": 0,
    }


def export_forecast_dataset(field, exporter):
    """Write a (ens, t, m, n), (t, m, n), (ens, m, n) or (m, n) block
    depending on the incremental mode (reference: io/exporters.py:666)."""
    field = np.asarray(field)
    inc = exporter["incremental"]
    shape = exporter["shape"]

    if inc is None:
        if exporter["num_ens_members"] > 1:
            expected = (exporter["num_ens_members"], exporter["num_timesteps"]) + shape
        else:
            expected = (exporter["num_timesteps"],) + shape
            field = field[None] if field.shape == expected else field
        if field.ndim == 3:
            field = field[None]
        _write_block(exporter, field, slice(None), slice(None))
    elif inc == "timestep":
        t = exporter["timestep_index"]
        if field.ndim == 2:
            field = field[None]
        _write_block(exporter, field[:, None], slice(None), slice(t, t + 1))
        exporter["timestep_index"] = t + 1
    elif inc == "member":
        j = exporter["member_index"]
        _write_block(exporter, field[None], slice(j, j + 1), slice(None))
        exporter["member_index"] = j + 1


def _write_block(exporter, block, ens_slice, time_slice):
    if exporter["method"] == "hdf5":
        exporter["dataset"][ens_slice, time_slice] = block
    elif exporter["method"] == "npz":
        exporter["buffer"][ens_slice, time_slice] = block
    elif exporter["method"] == "kineros":
        exporter["fields"].append(np.array(block))


def close_forecast_files(exporter):
    """Finalize the exporter (reference: io/exporters.py:753)."""
    if exporter["method"] == "hdf5":
        exporter["file"].close()
    elif exporter["method"] == "npz":
        np.savez_compressed(
            exporter["fname"],
            precip_forecast=exporter["buffer"],
            metadata=np.asarray(exporter["metadata"], dtype=object),
            startdate=str(exporter["startdate"]),
            timestep=exporter["timestep"],
        )
    elif exporter["method"] == "kineros":
        # per-element average rate time series
        fields = np.concatenate(exporter["fields"], axis=1)
        path = os.path.join(
            exporter["outpath"], exporter["outfnprefix"] + ".pre"
        )
        with open(path, "w") as f:
            mean_series = np.nanmean(fields, axis=(0, 2, 3))
            f.write("! Kineros2 rainfall input generated by pysteps_tpu\n")
            f.write("BEGIN RG1\n")
            f.write(f"  N = {len(mean_series)}\n")
            f.write("  TIME        DEPTH\n")
            depth = 0.0
            for i, rate in enumerate(mean_series):
                depth += rate * exporter["timestep"] / 60.0
                f.write(f"  {i * exporter['timestep']:8.1f}  {depth:10.3f}\n")
            f.write("END\n")
