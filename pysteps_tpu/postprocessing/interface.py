"""Post-processing registry (reference: pysteps/postprocessing/interface.py:187)."""

from pysteps_tpu.postprocessing import diagnostics, ensemblestats, probmatching

_postprocessing_methods = {
    "ensemblestats.mean": ensemblestats.mean,
    "ensemblestats.excprob": ensemblestats.excprob,
    "ensemblestats.banddepth": ensemblestats.banddepth,
    "probmatching.nonparam_match_empirical_cdf": probmatching.nonparam_match_empirical_cdf,
    "probmatching.pmm": probmatching.pmm_compute,
}

_diagnostics_methods = diagnostics._diagnostics
discover_postprocessors = diagnostics.discover_diagnostics


def add_postprocessor(name, function, _methods=None):
    """Register an external post-processor (plugin hook; reference:
    postprocessing/interface.py:79)."""
    table = _methods if _methods is not None else _postprocessing_methods
    if name in table:
        raise ValueError(f"postprocessor {name} already registered")
    table[name] = function


def get_method(name):
    try:
        return _postprocessing_methods[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown postprocessing method {name}; "
            f"available: {list(_postprocessing_methods)}"
        ) from None
