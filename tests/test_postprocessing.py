import jax
import jax.numpy as jnp
import numpy as np

from pysteps_tpu.postprocessing import ensemblestats, probmatching


def test_cdf_matching_matches_distribution():
    rng = np.random.RandomState(0)
    initial = rng.gamma(2.0, 2.0, (128, 128)).astype(np.float32)
    initial[initial < 1.0] = initial.min()
    target = rng.gamma(3.0, 1.5, (128, 128)).astype(np.float32)
    target[target < 1.0] = target.min()
    out = np.asarray(probmatching.nonparam_match_empirical_cdf(initial, target))
    # ranks conserved: strictly larger input -> greater-or-equal output
    flat_i, flat_o = initial.ravel(), out.ravel()
    order = np.argsort(flat_i, kind="stable")
    io, oo = flat_i[order], flat_o[order]
    strict = np.diff(io) > 0
    assert np.all(np.diff(oo)[strict] >= -1e-6)
    # distribution matches target (compare quantiles)
    for q in (0.5, 0.8, 0.95, 0.99):
        np.testing.assert_allclose(
            np.quantile(out, q), np.quantile(target, q), rtol=0.05, atol=0.1
        )


def test_cdf_matching_conserves_zeros():
    rng = np.random.RandomState(1)
    initial = rng.rand(64, 64).astype(np.float32)
    initial[initial < 0.7] = 0.0
    target = rng.gamma(2.0, 2.0, (64, 64)).astype(np.float32)
    out = np.asarray(probmatching.nonparam_match_empirical_cdf(initial, target))
    assert np.all(out[initial == 0.0] == target.min())


def test_empirical_cdf():
    cdf = np.asarray(
        probmatching.compute_empirical_cdf([0, 1, 2, 3], [1, 2, 1])
    )
    np.testing.assert_allclose(cdf, [0, 0.25, 0.75, 1.0])


def test_ensemble_mean_and_excprob():
    X = np.stack([np.full((8, 8), v) for v in (1.0, 2.0, 3.0, 6.0)])
    np.testing.assert_allclose(np.asarray(ensemblestats.mean(X)), 3.0)
    P = np.asarray(ensemblestats.excprob(X, 2.5))
    np.testing.assert_allclose(P, 0.5)
    P2 = np.asarray(ensemblestats.excprob(X, [0.5, 2.5]))
    assert P2.shape == (2, 8, 8)
    np.testing.assert_allclose(P2[0], 1.0)


def test_banddepth_orders_members():
    rng = np.random.RandomState(2)
    base = rng.rand(16, 16)
    # member 0 is central, member 3 is an outlier
    X = np.stack([base, base + 0.1, base - 0.1, base + 5.0])
    d = np.asarray(ensemblestats.banddepth(X))
    assert d[0] > d[3]


def test_resample_distributions():
    a = np.full(100, 5.0)
    b = np.full(100, 1.0)
    out = np.asarray(
        probmatching.resample_distributions(a, b, 1.0, key=jax.random.PRNGKey(0))
    )
    np.testing.assert_allclose(out, 5.0)
    out = np.asarray(
        probmatching.resample_distributions(a, b, 0.0, key=jax.random.PRNGKey(0))
    )
    np.testing.assert_allclose(out, 1.0)
