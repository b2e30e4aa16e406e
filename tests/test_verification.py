import numpy as np

from pysteps_tpu.verification import (
    detcatscores,
    detcontscores,
    ensscores,
    probscores,
    spatialscores,
)
from pysteps_tpu.verification.interface import get_method


def test_cat_scores_exact():
    pred = np.array([[1.0, 0.0], [1.0, 0.0]])
    obs = np.array([[1.0, 1.0], [0.0, 0.0]])
    # thr 0.5: H=1, F=1, M=1, R=1
    out = detcatscores.det_cat_fct(pred, obs, 0.5, scores="CSI")
    np.testing.assert_allclose(out, 1 / 3)
    out = detcatscores.det_cat_fct(pred, obs, 0.5, scores="POD")
    np.testing.assert_allclose(out, 0.5)
    out = detcatscores.det_cat_fct(pred, obs, 0.5, scores="BIAS")
    np.testing.assert_allclose(out, 1.0)


def test_cat_scores_streaming_merge():
    rng = np.random.RandomState(0)
    pred, obs = rng.rand(2, 64, 64)
    c_all = detcatscores.det_cat_fct_init(0.5)
    detcatscores.det_cat_fct_accum(c_all, pred, obs)
    c1 = detcatscores.det_cat_fct_init(0.5)
    c2 = detcatscores.det_cat_fct_init(0.5)
    detcatscores.det_cat_fct_accum(c1, pred[:32], obs[:32])
    detcatscores.det_cat_fct_accum(c2, pred[32:], obs[32:])
    merged = detcatscores.det_cat_fct_merge(c1, c2)
    np.testing.assert_allclose(
        detcatscores.det_cat_fct_compute(merged, "CSI"),
        detcatscores.det_cat_fct_compute(c_all, "CSI"),
    )


def test_cont_scores_exact():
    pred = np.array([1.0, 2.0, 3.0])
    obs = np.array([1.5, 2.0, 2.5])
    out = detcontscores.det_cont_fct(pred, obs)
    np.testing.assert_allclose(out["ME"], 0.0, atol=1e-6)
    np.testing.assert_allclose(out["MAE"], 1 / 3, atol=1e-6)
    np.testing.assert_allclose(out["RMSE"], np.sqrt(1 / 6), atol=1e-6)


def test_cont_streaming_matches_oneshot():
    rng = np.random.RandomState(1)
    pred = rng.rand(100)
    obs = rng.rand(100)
    one = detcontscores.det_cont_fct(pred, obs)
    st = detcontscores.det_cont_fct_init()
    detcontscores.det_cont_fct_accum(st, pred[:30], obs[:30])
    detcontscores.det_cont_fct_accum(st, pred[30:], obs[30:])
    stream = detcontscores.det_cont_fct_compute(st)
    for k in ("ME", "MAE", "MSE", "corr_p"):
        np.testing.assert_allclose(stream[k], one[k], rtol=1e-4, atol=1e-5)


def test_crps_perfect_and_known():
    obs = np.full((8, 8), 2.0)
    ens_perfect = np.stack([obs] * 5)
    assert probscores.CRPS(ens_perfect, obs) < 1e-6
    # analytic check: 2 members at obs +/- 1 -> CRPS = |err| terms:
    # term1 = 1, pairwise = 0.5 -> CRPS = 1 - 0.5 = 0.5
    ens = np.stack([obs - 1.0, obs + 1.0])
    np.testing.assert_allclose(probscores.CRPS(ens, obs), 0.5, atol=1e-6)


def test_fss_perfect_and_degraded():
    rng = np.random.RandomState(3)
    obs = (rng.rand(64, 64) > 0.7).astype(float)
    assert spatialscores.fss(obs, obs, 0.5, 4) > 0.999
    pred = np.roll(obs, 5, axis=1)
    fss_small = spatialscores.fss(pred, obs, 0.5, 1)
    fss_large = spatialscores.fss(pred, obs, 0.5, 16)
    assert fss_large > fss_small  # skill improves with scale


def test_rankhist_uniform_for_calibrated():
    rng = np.random.RandomState(4)
    n_members = 10
    X_f = rng.randn(n_members, 32, 32)
    X_o = rng.randn(32, 32)
    h = ensscores.rankhist(X_f, X_o)
    assert h.shape == (n_members + 1,)
    np.testing.assert_allclose(h.sum(), 1.0)
    assert h.max() < 3.0 / (n_members + 1)  # roughly flat


def test_roc_area():
    rng = np.random.RandomState(5)
    obs = rng.rand(1000) > 0.5
    # informative probabilities
    P = np.clip(obs * 0.7 + rng.rand(1000) * 0.3, 0, 1)
    POFD, POD, area = probscores.ROC_curve(P, obs.astype(float), 0.5, compute_area=True)
    assert area > 0.8


def test_interface():
    assert get_method("CSI") is not None
    assert get_method("RMSE") is not None
    assert get_method("CRPS", type="probabilistic") is not None
    assert get_method("rankhist", type="ensemble") is not None
