"""Build the native decoder library with the system toolchain."""

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SOURCES = [
    os.path.join(_DIR, "decoders.cpp"),
    os.path.join(_DIR, "grib2.cpp"),
]
LIB = os.path.join(_DIR, "_decoders.so")


def build(force=False, verbose=False):
    """Compile the native sources -> _decoders.so; returns the lib path or
    None."""
    if (
        not force
        and os.path.exists(LIB)
        and all(os.path.getmtime(LIB) >= os.path.getmtime(s) for s in SOURCES)
    ):
        return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        *SOURCES, "-o", LIB, "-lz",
    ]
    try:
        subprocess.run(
            cmd, check=True,
            capture_output=not verbose,
        )
        return LIB
    except (subprocess.CalledProcessError, FileNotFoundError) as err:
        if verbose:
            print(f"native build failed: {err}", file=sys.stderr)
        return None


if __name__ == "__main__":
    path = build(force=True, verbose=True)
    print(path or "build failed")
