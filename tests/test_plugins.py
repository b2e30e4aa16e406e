"""Plugin-system tests (reference: pysteps/tests/test_plugins_support.py)."""

import numpy as np
import pytest


def test_add_postprocessor_and_diagnostic():
    from pysteps_tpu.postprocessing import add_postprocessor, get_method
    from pysteps_tpu.postprocessing.diagnostics import (
        add_diagnostic,
        get_diagnostic,
    )

    def my_pp(x):
        return np.asarray(x) * 2

    add_postprocessor("test.double", my_pp)
    assert get_method("test.double")(np.ones(3)).sum() == 6
    with pytest.raises(ValueError):
        add_postprocessor("test.double", my_pp)

    def my_diag(x):
        return float(np.max(x))

    add_diagnostic("test.maxval", my_diag)
    assert get_diagnostic("test.maxval")(np.array([1.0, 5.0])) == 5.0


def test_importer_plugin_registration():
    from pysteps_tpu.io import interface as io_interface

    def my_importer(filename, **kwargs):
        return np.zeros((4, 4)), None, {"unit": "mm/h"}

    io_interface._importer_methods["test_format"] = my_importer
    imp = io_interface.get_method("test_format", "importer")
    precip, _, meta = imp("whatever")
    assert precip.shape == (4, 4)
    del io_interface._importer_methods["test_format"]
