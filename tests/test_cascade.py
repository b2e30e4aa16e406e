import jax.numpy as jnp
import numpy as np
import pytest

from pysteps_tpu.cascade import bandpass_filters, decomposition


@pytest.fixture(scope="module")
def bp_filter():
    return bandpass_filters.filter_gaussian((128, 128), 6)


def test_filter_gaussian_normalization(bp_filter):
    w2 = np.asarray(bp_filter["weights_2d"])
    assert w2.shape == (6, 128, 65)
    # weights sum to one at every wavenumber
    np.testing.assert_allclose(w2.sum(axis=0), 1.0, atol=1e-6)
    # DC assigned to level 0 only
    assert w2[0, 0, 0] == 1.0
    assert np.all(w2[1:, 0, 0] == 0.0)


def test_filter_uniform():
    f = bandpass_filters.filter_uniform((64, 64), 1)
    assert np.asarray(f["weights_2d"]).shape == (1, 64, 33)


def test_decompose_recompose_roundtrip(bp_filter):
    rng = np.random.RandomState(0)
    field = jnp.asarray(rng.randn(128, 128), jnp.float32)
    levels, means, stds = decomposition.decompose_core(
        field, bp_filter["weights_2d"], normalize=True
    )
    assert levels.shape == (6, 128, 128)
    # normalized levels ~ N(0, 1)
    np.testing.assert_allclose(np.asarray(jnp.mean(levels, axis=(1, 2))), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(levels, axis=(1, 2))), 1, atol=1e-3)
    recomposed = decomposition.recompose_core(levels, means, stds)
    np.testing.assert_allclose(np.asarray(recomposed), np.asarray(field), atol=1e-3)


def test_decompose_spectral_matches_spatial(bp_filter):
    rng = np.random.RandomState(1)
    field = jnp.asarray(rng.randn(128, 128), jnp.float32)
    _, means_s, stds_s = decomposition.decompose_core(
        field, bp_filter["weights_2d"], normalize=True
    )
    levels_fft, means_f, stds_f = decomposition.decompose_spectral_core(
        jnp.fft.rfft2(field), bp_filter["weights_2d"], (128, 128)
    )
    np.testing.assert_allclose(np.asarray(means_s), np.asarray(means_f), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stds_s), np.asarray(stds_f), rtol=1e-3, atol=1e-4
    )
    recomposed = decomposition.recompose_spectral_core(
        levels_fft, means_f, stds_f, (128, 128)
    )
    np.testing.assert_allclose(np.asarray(recomposed), np.asarray(field), atol=1e-3)


def test_decomposition_fft_dict_api(bp_filter):
    rng = np.random.RandomState(2)
    field = rng.randn(128, 128).astype(np.float32)
    out = decomposition.decomposition_fft(field, bp_filter, normalize=True)
    assert out["domain"] == "spatial"
    assert out["normalized"]
    assert out["cascade_levels"].shape == (6, 128, 128)
    rec = decomposition.recompose_fft(out)
    np.testing.assert_allclose(np.asarray(rec), field, atol=1e-3)


def test_decompose_masked_stats(bp_filter):
    rng = np.random.RandomState(3)
    field = jnp.asarray(rng.randn(128, 128), jnp.float32)
    mask = jnp.zeros((128, 128), dtype=bool).at[32:96, 32:96].set(True)
    levels, means, stds = decomposition.decompose_core(
        field, bp_filter["weights_2d"], mask=mask, normalize=False
    )
    lv = np.asarray(levels[2])
    mk = np.asarray(mask)
    np.testing.assert_allclose(float(means[2]), lv[mk].mean(), atol=1e-5)
    np.testing.assert_allclose(float(stds[2]), lv[mk].std(), atol=1e-4)


def test_compact_output_roundtrip():
    rng = np.random.RandomState(0)
    field = rng.randn(64, 64).astype(np.float32)
    bp = bandpass_filters.filter_gaussian((64, 64), 6)
    d_comp = decomposition.decomposition_fft(
        field, bp, output_domain="spectral", normalize=True, compact_output=True
    )
    assert d_comp["compact_output"] is True
    assert isinstance(d_comp["cascade_levels"], list)
    n_comp = sum(np.asarray(lvl).size for lvl in d_comp["cascade_levels"])
    assert n_comp < 6 * 64 * 33  # strictly fewer coefficients than dense
    recomposed = np.fft.irfft2(
        np.asarray(decomposition.recompose_fft(d_comp)), s=(64, 64)
    )
    np.testing.assert_allclose(recomposed, field, atol=1e-3)


def test_spectral_level_stds_matches_materialized():
    """The matmul Parseval contraction must equal the per-level statistics
    of the materialized spectral cascade (decompose_spectral_core)."""
    import jax.numpy as jnp

    from pysteps_tpu.cascade.bandpass_filters import filter_gaussian
    from pysteps_tpu.cascade.decomposition import (
        decompose_spectral_core,
        spectral_level_stds,
    )

    rng = np.random.RandomState(3)
    shape = (64, 48)
    field = rng.randn(*shape).astype(np.float32)
    field_fft = jnp.asarray(np.fft.rfft2(field).astype(np.complex64))
    weights = filter_gaussian(shape, 5)["weights_2d"].astype(np.float32)

    _, means_ref, stds_ref = decompose_spectral_core(
        field_fft, weights, shape, normalize=False
    )
    means, stds = spectral_level_stds(field_fft, weights, shape)
    np.testing.assert_allclose(np.asarray(means), np.asarray(means_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stds), np.asarray(stds_ref), rtol=2e-4, atol=1e-6
    )
