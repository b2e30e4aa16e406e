"""
Configuration bootstrap (reference: pysteps/__init__.py:29-221).

Loads an rc file (JSON with ``//`` comments) describing data sources and
output paths, exposes it as an attribute-accessible dot-dict ``rcparams``.
Search order: ``$PYSTEPS_TPU_RC`` > ``./pysteps_tpu_rc`` (or ``pystepsrc``)
> ``$HOME/.pysteps_tpu/pysteps_tpu_rc`` > packaged defaults.
"""

import json
import os
import warnings


class DotDict(dict):
    """Dict with attribute access, applied recursively (reference:
    pysteps/__init__.py:117 `_DotDictify`)."""

    def __getattr__(self, name):
        try:
            value = self[name]
        except KeyError as err:
            raise AttributeError(name) from err
        if isinstance(value, dict) and not isinstance(value, DotDict):
            value = DotDict(value)
            self[name] = value
        return value

    def __setattr__(self, name, value):
        self[name] = value


_DEFAULT_RC = {
    "outputs": {"path_workdir": "./tmp"},
    "silent_import": False,
    "plot": {"motion_plot": "quiver", "colorscale": "pysteps"},
    "data_sources": {},
}


def _strip_json_comments(text):
    # remove //-comments that are not inside strings (rc files are simple
    # enough that a line-based strip is sufficient, mirroring jsmin usage)
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


def _candidate_paths():
    env = os.environ.get("PYSTEPS_TPU_RC")
    if env:
        yield env
        if os.path.isdir(env):
            yield os.path.join(env, "pysteps_tpu_rc")
    for name in ("pysteps_tpu_rc", "pystepsrc"):
        yield os.path.join(os.getcwd(), name)
    home = os.environ.get("HOME", "")
    if home:
        yield os.path.join(home, ".pysteps_tpu", "pysteps_tpu_rc")


def config_fname():
    """Location of the rc file that load_config_file() would use, or the
    packaged default if no user file exists (reference: pysteps/__init__.py:76).
    """
    for cand in _candidate_paths():
        if cand and os.path.isfile(cand):
            return cand
    return os.path.join(os.path.dirname(__file__), "pysteps_tpu_rc")


def load_config_file(params_file=None, verbose=False, dryrun=False):
    """Load an rc parameter file and return it as a DotDict.

    Parameters mirror the reference loader (pysteps/__init__.py:150):
    ``dryrun=True`` parses and validates without touching the module-level
    ``rcparams``.
    """
    params = json.loads(json.dumps(_DEFAULT_RC))  # deep copy
    path = None
    if params_file is not None:
        path = params_file
    else:
        for cand in _candidate_paths():
            if cand and os.path.isfile(cand):
                path = cand
                break
    if path is not None:
        try:
            with open(path) as f:
                loaded = json.loads(_strip_json_comments(f.read()))
            _validate_rc(loaded)
            params.update(loaded)
            if verbose:
                print(f"pysteps_tpu configuration loaded from {path}")
        except (OSError, json.JSONDecodeError) as err:
            warnings.warn(f"could not load rc file {path}: {err}; using defaults")
    if dryrun:
        return DotDict(params)
    global rcparams
    rcparams = DotDict(params)
    return rcparams


_SOURCE_REQUIRED_KEYS = (
    "root_path",
    "path_fmt",
    "fn_pattern",
    "fn_ext",
    "importer",
    "timestep",
    "importer_kwargs",
)


def _validate_rc(params):
    """Light-weight schema validation (reference validates against a
    Draft-4 JSON schema, pysteps/pystepsrc_schema.json)."""
    if not isinstance(params, dict):
        raise ValueError("rc file must contain a JSON object")
    sources = params.get("data_sources", {})
    for name, src in sources.items():
        missing = [k for k in _SOURCE_REQUIRED_KEYS if k not in src]
        if missing:
            warnings.warn(f"data source '{name}' missing keys: {missing}")


rcparams = DotDict(json.loads(json.dumps(_DEFAULT_RC)))
load_config_file()
