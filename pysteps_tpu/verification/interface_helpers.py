"""Shared helpers to avoid circular imports in the verification package."""


def resolve_det_score(metric):
    from pysteps_tpu.verification import detcatscores, detcontscores

    metric_l = metric.lower()
    cont = {
        "me", "mae", "mse", "rmse", "nmse", "drmse", "beta1", "beta2",
        "corr_p", "rv", "scatter",
    }
    if metric_l in cont:
        return lambda pred, obs, **kw: detcontscores.det_cont_fct(
            pred, obs, scores=metric, **kw
        )
    return lambda pred, obs, thr=0.1, **kw: detcatscores.det_cat_fct(
        pred, obs, thr, scores=metric, **kw
    )
