"""
Plugin-extensible forecast diagnostics
(reference: pysteps/postprocessing/diagnostics.py — empty by default,
populated by entry-point plugins).
"""

_diagnostics = {}


def add_diagnostic(name, function):
    """Register a diagnostic postprocessor."""
    if name in _diagnostics:
        raise ValueError(f"diagnostic {name} already registered")
    _diagnostics[name] = function


def get_diagnostic(name):
    try:
        return _diagnostics[name]
    except KeyError:
        raise ValueError(
            f"unknown diagnostic {name}; available: {list(_diagnostics)}"
        ) from None


def discover_diagnostics():
    """Load diagnostics from the 'pysteps_tpu.plugins.diagnostics' entry
    point group (reference: postprocessing/interface.py:79)."""
    try:
        from importlib import metadata as importlib_metadata

        for ep in importlib_metadata.entry_points(
            group="pysteps_tpu.plugins.diagnostics"
        ):
            _diagnostics[ep.name] = ep.load()
    except Exception:  # noqa: BLE001 — best-effort discovery
        pass


discover_diagnostics()
