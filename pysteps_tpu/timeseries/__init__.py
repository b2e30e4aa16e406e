from pysteps_tpu.timeseries import autoregression, correlation  # noqa: F401
