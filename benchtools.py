"""Helpers for benchmarking against the reference pysteps (CPU, NumPy).

The reference at /root/reference has unbuilt Cython extensions and two
missing pure-python deps (jsmin, jsonschema); this module stubs just enough
to import and run its STEPS nowcast for a like-for-like baseline.
"""

import sys
import types


def _strip_json_comments(text):
    out_lines = []
    for line in text.splitlines():
        in_str = False
        prev = ""
        cut = len(line)
        for i, ch in enumerate(line):
            if ch == '"' and prev != "\\":
                in_str = not in_str
            if not in_str and ch == "/" and i + 1 < len(line) and line[i + 1] == "/":
                cut = i
                break
            prev = ch
        out_lines.append(line[:cut])
    return "\n".join(out_lines)


def import_reference_pysteps(path="/root/reference"):
    """Import the reference pysteps with import-time stubs.  Returns the
    module, or None if import fails."""
    try:
        if "jsmin" not in sys.modules:
            try:
                import jsmin  # noqa: F401
            except ImportError:
                m = types.ModuleType("jsmin")
                m.jsmin = _strip_json_comments
                sys.modules["jsmin"] = m
        try:
            import jsonschema  # noqa: F401
        except ImportError:
            m = types.ModuleType("jsonschema")
            m.validate = lambda *a, **k: None
            sys.modules["jsonschema"] = m

        def _unavailable(*a, **k):
            raise NotImplementedError("native extension not built")

        # NumPy-vectorized ports of the Cython kernels (same algorithms,
        # timing baselines): scripts/ref_native_numpy.py.  Falls back to
        # unavailable-stubs if the port module cannot be imported.
        try:
            import os

            sys.path.insert(
                0,
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"),
            )
            import ref_native_numpy as _rnn

            impls = {
                "pysteps.motion._proesmans": {
                    "_compute_advection_field": _rnn._compute_advection_field
                },
                "pysteps.motion._vet": {
                    "_warp": _rnn._warp,
                    "_cost_function": _rnn._cost_function,
                },
            }
        except Exception:  # noqa: BLE001
            impls = {
                "pysteps.motion._proesmans": {
                    "_compute_advection_field": _unavailable
                },
                "pysteps.motion._vet": {
                    "_warp": _unavailable,
                    "_cost_function": _unavailable,
                },
            }
        for name, syms in impls.items():
            if name not in sys.modules:
                m = types.ModuleType(name)
                for s, fn in syms.items():
                    setattr(m, s, fn)
                sys.modules[name] = m

        if path not in sys.path:
            sys.path.insert(0, path)
        import pysteps

        return pysteps
    except Exception as err:  # noqa: BLE001
        print(f"reference pysteps unavailable: {err}", file=sys.stderr)
        return None
