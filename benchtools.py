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

        for name, syms in [
            ("pysteps.motion._proesmans", ["_compute_advection_field"]),
            ("pysteps.motion._vet", ["_warp", "_cost_function"]),
        ]:
            if name not in sys.modules:
                m = types.ModuleType(name)
                for s in syms:
                    setattr(m, s, _unavailable)
                sys.modules[name] = m

        if path not in sys.path:
            sys.path.insert(0, path)
        import pysteps

        return pysteps
    except Exception as err:  # noqa: BLE001
        print(f"reference pysteps unavailable: {err}", file=sys.stderr)
        return None
