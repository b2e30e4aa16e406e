"""Tests for reference-API parity additions: streaming intensity-scale,
localized VAR OLS, vet helpers (morph / cost function), visualization utils,
create_timestep_range, interface info functions."""

import numpy as np
import pytest


def test_intensity_scale_streaming_matches_direct():
    from pysteps_tpu.verification.spatialscores import (
        intensity_scale,
        intensity_scale_accum,
        intensity_scale_compute,
        intensity_scale_init,
        intensity_scale_merge,
    )

    rng = np.random.RandomState(0)
    X_o = rng.exponential(1.0, (64, 64))
    X_f = X_o + 0.3 * rng.randn(64, 64)

    st = intensity_scale_init("FSS", [0.5, 1.0], [2, 4, 8])
    intensity_scale_accum(st, X_f, X_o)
    direct = intensity_scale(X_f, X_o, "fss", [0.5, 1.0], [2, 4, 8])
    assert np.allclose(direct, intensity_scale_compute(st))

    # merge of two separately accumulated halves == accumulating both
    s1 = intensity_scale_init("fss", [0.5], [2, 4])
    s2 = intensity_scale_init("fss", [0.5], [2, 4])
    both = intensity_scale_init("fss", [0.5], [2, 4])
    intensity_scale_accum(s1, X_f, X_o)
    intensity_scale_accum(s2, X_o, X_f)
    intensity_scale_accum(both, X_f, X_o)
    intensity_scale_accum(both, X_o, X_f)
    assert np.allclose(
        intensity_scale_compute(intensity_scale_merge(s1, s2)),
        intensity_scale_compute(both),
    )

    # bmse path: scales resolved after first accumulation
    sb = intensity_scale_init("BMSE", [0.5])
    intensity_scale_accum(sb, X_f, X_o)
    out = intensity_scale_compute(sb)
    assert out.shape == (len(sb["scales"]), 1)


def test_var_ols_localized_recovers_var1():
    from pysteps_tpu.timeseries.autoregression import (
        estimate_var_params_ols_localized,
    )

    rng = np.random.RandomState(3)
    q, m, n = 2, 24, 24
    Phi = np.array([[0.7, 0.2], [0.1, 0.6]])
    x = np.zeros((4, q, m, n))
    x[0] = rng.randn(q, m, n)
    for t in range(1, 4):
        x[t] = np.einsum("ab,bmn->amn", Phi, x[t - 1]) + 0.05 * rng.randn(q, m, n)

    out = estimate_var_params_ols_localized(x, 1, window_radius=5, h=2,
                                            window="uniform")
    assert len(out) == 2  # Phi_1 + zero innovation matrix
    est = np.asarray(out[0])[:, :, m // 2, n // 2]
    assert np.allclose(est, Phi, atol=0.05)
    assert np.allclose(np.asarray(out[-1]), 0.0)

    out_c = estimate_var_params_ols_localized(
        x, 1, window_radius=5, h=2, include_constant_term=True
    )
    assert len(out_c) == 3 and np.asarray(out_c[0]).shape == (q, m, n)


def test_vet_morph_and_cost_function():
    from pysteps_tpu.motion.vet import (
        ceil_int,
        morph,
        round_int,
        vet_cost_function,
        vet_cost_function_gradient,
    )

    rng = np.random.RandomState(0)
    img = rng.rand(64, 64)
    d = np.zeros((2, 64, 64))
    d[0] += 3.0
    d[1] -= 2.0
    warped, mask = morph(img, d)
    # out[x] = img[x - d]
    assert np.allclose(warped[10:50, 10:50], img[7:47, 12:52])
    assert mask[:3].max() == 2 and mask[30, 30] == 0
    _, _, grad = morph(img, d, gradient=True)
    assert grad.shape == (2, 64, 64)

    zeros = np.zeros(2 * 4 * 4)
    no_mask = np.zeros((64, 64), bool)
    pair = np.stack([img, img])
    assert vet_cost_function(zeros, pair, (4, 4), no_mask, 1e-3) < 1e-6
    g = vet_cost_function_gradient(zeros, pair, (4, 4), no_mask, 1e-3)
    assert g.shape == (32,)

    # cost at the true displacement is far below cost at zero
    target, _ = morph(img, d)
    pair = np.stack([img, target])
    c0 = vet_cost_function(zeros, pair, (4, 4), no_mask, 0.0)
    true_disp = np.concatenate([np.full(16, 3.0), np.full(16, -2.0)])
    ct = vet_cost_function(true_disp, pair, (4, 4), no_mask, 0.0)
    assert ct < 0.05 * c0

    assert round_int(2.6) == 3 and ceil_int(2.1) == 3


def test_visualization_utils():
    import matplotlib

    matplotlib.use("Agg")
    from pysteps_tpu.visualization.utils import (
        get_basemap_axis,
        get_geogrid,
        parse_proj4_string,
    )

    d = parse_proj4_string(
        "+proj=lcc +lat_1=46 +lat_2=49 +lon_0=8.5 +x_0=600000 +no_defs"
    )
    assert d["proj"] == "lcc"
    assert d["lat_1"] == 46 and d["x_0"] == 600000 and d["no_defs"] is True

    geodata = {"projection": "+proj=stere", "x1": 0.0, "x2": 640.0,
               "y1": 0.0, "y2": 640.0, "yorigin": "upper"}
    x_grid, y_grid, extent, regular, origin = get_geogrid(64, 64, geodata)
    assert x_grid.shape == (64, 64) and extent == (0.0, 640.0, 0.0, 640.0)
    assert regular and origin == "upper"
    # upper origin: first row has the largest y
    assert y_grid[0, 0] > y_grid[-1, 0]
    ax = get_basemap_axis(extent, geodata=geodata)
    assert ax is not None


def test_motion_plot_dispatch():
    import matplotlib

    matplotlib.use("Agg")
    from pysteps_tpu.visualization import motion_plot

    uv = np.random.randn(2, 32, 32)
    assert motion_plot(uv, "quiver") is not None
    assert motion_plot(uv, "streamplot") is not None
    with pytest.raises(ValueError):
        motion_plot(uv, "nope")


def test_create_timestep_range():
    from pysteps_tpu.nowcasts.utils import create_timestep_range

    ts, orig, kind = create_timestep_range(4)
    assert list(ts) == [0, 1, 2, 3, 4] and orig is None and kind == "int"
    bins, orig, kind = create_timestep_range([0.5, 1.5, 3.0])
    assert kind == "list" and orig == [0, 0.5, 1.5, 3.0]
    assert sum(len(b) for b in bins) == 4


def test_interface_info_functions(capsys):
    from pysteps_tpu.io.interface import importers_info
    from pysteps_tpu.postprocessing.interface import postprocessors_info

    module_importers, registered = importers_info()
    assert "import_fmi_pgm" in module_importers
    mod, iface = postprocessors_info()
    assert any("excprob" in n for n in iface)
    capsys.readouterr()


def test_blending_check_norain_deprecated_alias():
    from pysteps_tpu.blending.utils import check_norain

    with pytest.deprecated_call():
        assert check_norain(np.zeros((8, 8))) is np.True_ or check_norain(
            np.zeros((8, 8))
        )


def test_config_fname_exists():
    import os

    from pysteps_tpu import config_fname

    assert os.path.isfile(config_fname())


def test_rc_schema_validation(tmp_path):
    """Malformed rc files are rejected with RuntimeError listing every
    schema violation, as the reference's Draft-4 validation does
    (pysteps/__init__.py:195-207)."""
    import json

    from pysteps_tpu.config import load_config_file

    good = {
        "outputs": {"path_workdir": "/tmp/x"},
        "plot": {"motion_plot": "quiver", "colorscale": "pysteps"},
        "data_sources": {
            "src": {
                "root_path": "/data",
                "path_fmt": "%Y",
                "fn_pattern": "f",
                "fn_ext": "npz",
                "importer": "npz",
                "timestep": 5,
                "importer_kwargs": {},
            }
        },
    }
    p = tmp_path / "rc_good"
    p.write_text(json.dumps(good))
    assert load_config_file(str(p), dryrun=True)["outputs"]["path_workdir"] == "/tmp/x"

    bad = json.loads(json.dumps(good))
    bad["data_sources"]["src"]["timestep"] = "five"  # wrong type
    del bad["data_sources"]["src"]["importer"]  # missing required
    del bad["plot"]  # missing required top-level
    p_bad = tmp_path / "rc_bad"
    p_bad.write_text(json.dumps(bad))
    with pytest.raises(RuntimeError) as err:
        load_config_file(str(p_bad), dryrun=True)
    msg = str(err.value)
    assert "'plot' is a required property" in msg
    assert "'importer' is a required property" in msg
    assert "data_sources/src/timestep" in msg and "not of type 'number'" in msg


def test_steps_nowcaster_dataclasses():
    """StepsNowcasterParams/State are registered pytrees carrying the init
    outputs of the STEPS core."""
    import jax

    from pysteps_tpu.nowcasts.steps import (
        StepsNowcasterParams,
        StepsNowcasterState,
    )

    import jax.numpy as jnp

    params = StepsNowcasterParams(
        phi=jnp.zeros((6, 3)), gamma=jnp.zeros((6, 2)), means=jnp.zeros(6),
        stds=jnp.ones(6), war=jnp.float32(0.1), mu_0=jnp.float32(1.0),
        velocity_unit=jnp.zeros((2, 8, 8)), velocity_perp=jnp.zeros((2, 8, 8)),
        precip_min=jnp.float32(-15.0), precip_last=jnp.zeros((8, 8)),
        noise_filter=jnp.zeros((8, 5)),
    )
    leaves = jax.tree_util.tree_leaves(params)
    assert len(leaves) == 11
    doubled = jax.tree_util.tree_map(lambda x: x * 2, params)
    assert isinstance(doubled, StepsNowcasterParams)
    assert float(doubled.stds[0]) == 2.0

    state = StepsNowcasterState(
        window=jnp.zeros((6, 2, 8, 8)), precip_mask=jnp.ones((8, 8)),
        member_keys=jax.random.split(jax.random.PRNGKey(0), 4),
        eps_par=jnp.zeros(4), eps_perp=jnp.zeros(4),
    )
    assert isinstance(jax.tree_util.tree_map(lambda x: x, state),
                      StepsNowcasterState)


def test_blending_class_api():
    """StepsBlendingConfig + StepsBlendingNowcaster produce the same
    forecast as the flat wrapper."""
    from pysteps_tpu.blending.steps import (
        StepsBlendingConfig,
        StepsBlendingNowcaster,
        forecast,
    )

    from helpers import make_synthetic_sequence

    frames = np.asarray(
        make_synthetic_sequence(n_frames=3, shape=(64, 64),
                                velocity=(1.0, 0.5), seed=3)
    )
    precip = np.where(frames > 0.1, 10 * np.log10(np.maximum(frames, 0.1)),
                      -15.0).astype(np.float32)
    rng = np.random.RandomState(0)
    precip += 0.05 * rng.randn(*precip.shape).astype(np.float32)
    velocity = np.zeros((2, 64, 64), np.float32)
    nwp = np.repeat(precip[-1][None], 4, axis=0)[None]  # (1, T+1, m, n)
    vel_models = np.zeros((1, 2, 64, 64), np.float32)

    cfg = StepsBlendingConfig(
        precip_threshold=-10.0, timestep=5.0, n_ens_members=2,
        n_cascade_levels=4, seed=7, mask_method=None,
        probmatching_method=None,
    )
    out_cls = StepsBlendingNowcaster(
        precip, nwp, velocity, vel_models, 3,
        steps_blending_config=cfg,
    ).compute_forecast()
    out_flat = forecast(
        precip, nwp, velocity, vel_models, 3, 5.0, n_ens_members=2,
        n_cascade_levels=4, precip_thr=-10.0, seed=7, mask_method=None,
        probmatching_method=None,
    )
    assert out_cls.shape == (2, 3, 64, 64)
    np.testing.assert_allclose(np.asarray(out_cls), np.asarray(out_flat),
                               atol=1e-5)


def test_pca_enkf_class_api():
    """EnKFCombinationNowcaster classes mirror the reference architecture
    and agree with the flat forecast wrapper."""
    from pysteps_tpu.blending.pca_ens_kalman_filter import (
        EnKFCombinationConfig,
        EnKFCombinationNowcaster,
        EnKFCombinationParams,
        ForecastInitialization,
        ForecastModel,
        ForecastState,
        forecast,
    )

    from helpers import make_synthetic_sequence

    frames = np.asarray(
        make_synthetic_sequence(n_frames=3, shape=(64, 64),
                                velocity=(1.0, 0.5), seed=5)
    )
    precip = np.where(frames > 0.1, 10 * np.log10(np.maximum(frames, 0.1)),
                      -15.0).astype(np.float32)
    rng = np.random.RandomState(1)
    precip += 0.05 * rng.randn(*precip.shape).astype(np.float32)
    velocity = np.zeros((2, 64, 64), np.float32)
    nwp = np.repeat(precip[-1][None], 3, axis=0)[None]  # (1, T, m, n)

    cfg = EnKFCombinationConfig(n_ens_members=2, n_cascade_levels=4,
                                precip_threshold=-10.0, seed=11)
    out_cls = EnKFCombinationNowcaster(
        precip, nwp, velocity, 3, enkf_combination_config=cfg
    ).compute_forecast()
    out_flat = forecast(
        precip, None, nwp, None, velocity, 3, n_ens_members=2,
        n_cascade_levels=4, precip_thr=-10.0, seed=11,
    )
    # reference contract: output series starts at the t0 analysis
    assert out_cls.shape == (2, 4, 64, 64)
    np.testing.assert_allclose(np.asarray(out_cls), np.asarray(out_flat),
                               atol=1e-5)
    # the auxiliary classes expose the reference architecture
    assert ForecastState(analysis=None, rng_key=None).timestep == 0
    assert EnKFCombinationParams().n_nwp_members == 0
    assert hasattr(ForecastModel(cfg, EnKFCombinationParams(), None),
                   "correction_step")
    assert hasattr(
        ForecastInitialization(precip, velocity, cfg, 3), "compute_background"
    )


def test_vel_pert_analysis_scripts():
    """run_vel_pert_analysis + fit_vel_pert_params recover a known BPS
    growth curve (reference: pysteps/scripts/)."""
    from pysteps_tpu.scripts.fit_vel_pert_params import (
        compute_stds,
        fit_parameters,
        growth_curve,
    )
    from pysteps_tpu.scripts.run_vel_pert_analysis import accumulate_pair

    rng = np.random.RandomState(0)
    V0 = np.stack([np.full((32, 32), 3.0), np.full((32, 32), 1.0)])
    n_par = V0 / np.linalg.norm(V0, axis=0)
    n_perp = np.stack([-n_par[1], n_par[0]])
    results = {}
    for lt in (5, 10, 20, 30, 40, 60):
        sigma = 0.5 * lt**0.6 + 0.2
        for _ in range(64):
            V2 = (V0 + sigma * rng.randn() * n_par
                  + 0.5 * sigma * rng.randn() * n_perp)
            accumulate_pair(results, V0, V2, lt)

    leadtimes, std_par, std_perp = compute_stds(results)
    assert len(leadtimes) == 6 and np.all(np.diff(std_par) > -1.0)
    p_par, p_perp = fit_parameters(results)
    assert p_par is not None
    pred = growth_curve(40.0, *p_par)
    true = 0.5 * 40**0.6 + 0.2
    assert abs(pred - true) / true < 0.25
    # perpendicular component was generated at half amplitude
    assert growth_curve(40.0, *p_perp) < pred
