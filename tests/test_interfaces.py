"""Registry tests for every get_method (reference strategy:
pysteps/tests/test_interfaces.py:9-404)."""

import pytest


def _check(module, valid_names, invalid_name="__nonexistent__"):
    for name in valid_names:
        assert module.get_method(name) is not None
    with pytest.raises(ValueError):
        module.get_method(invalid_name)


def test_cascade_interface():
    from pysteps_tpu import cascade

    _check(cascade, ["fft", "gaussian", "uniform"])


def test_extrapolation_interface():
    from pysteps_tpu import extrapolation

    for name in ["semilagrangian", "eulerian", None]:
        assert extrapolation.get_method(name) is not None
    with pytest.raises(ValueError):
        extrapolation.get_method("bogus")


def test_motion_interface():
    from pysteps_tpu import motion

    _check(
        motion,
        ["lk", "lucaskanade", "vet", "darts", "proesmans", "farneback", "constant"],
    )
    with pytest.raises(NotImplementedError):
        motion.get_method("brox")


def test_noise_interface():
    from pysteps_tpu import noise

    for name in ["parametric", "nonparametric", "ssft", "nested", "bps"]:
        init, gen = noise.get_method(name)
        assert callable(init) and callable(gen)


def test_nowcasts_interface():
    from pysteps_tpu import nowcasts

    _check(
        nowcasts,
        [
            "anvil", "eulerian", "extrapolation", "lagrangian",
            "lagrangian_probability", "linda", "probability", "sprog",
            "sseps", "steps",
        ],
    )


def test_blending_interface():
    from pysteps_tpu import blending

    _check(blending, ["linear_blending", "salient_blending", "steps", "pca_enkf"])


def test_downscaling_interface():
    from pysteps_tpu import downscaling

    _check(downscaling, ["rainfarm"])


def test_feature_interface():
    from pysteps_tpu import feature

    _check(feature, ["shitomasi", "blob", "tstorm"])


def test_tracking_interface():
    from pysteps_tpu import tracking

    _check(tracking, ["lucaskanade", "tdating"])


def test_utils_interface():
    from pysteps_tpu import utils

    for name in [
        "mm/h", "mm", "dbz", "accumulate", "clip", "square", "upscale",
        "rapsd", "db", "boxcox", "nqt", "sqrt", "idwinterp2d", "rbfinterp2d",
        "decluster", "detect_outliers", "pca_transform", "morph_opening",
    ]:
        assert utils.get_method(name) is not None
    fft = utils.get_method("numpy", shape=(32, 32))
    assert hasattr(fft, "rfft2")
    with pytest.raises(ValueError):
        utils.get_method("__nope__")


def test_verification_interface():
    from pysteps_tpu import verification

    for name in ["csi", "pod", "rmse", "mae", "fss"]:
        assert verification.get_method(name) is not None
    for name in ["crps", "reldiag", "roc"]:
        assert verification.get_method(name, type="probabilistic") is not None
    for name in ["ens_skill", "ens_spread", "rankhist"]:
        assert verification.get_method(name, type="ensemble") is not None


def test_io_interface():
    from pysteps_tpu import io as io_module

    for name in ["fmi_pgm", "mch_gif", "odim_hdf5", "npz"]:
        assert io_module.get_method(name, "importer") is not None
    for name in ["hdf5", "npz", "kineros"]:
        assert io_module.get_method(name, "exporter") is not None


def test_postprocessing_interface():
    from pysteps_tpu import postprocessing

    assert postprocessing.get_method("ensemblestats.mean") is not None


def test_top_level_import():
    import pysteps_tpu

    assert pysteps_tpu.rcparams is not None
    assert pysteps_tpu.__version__
