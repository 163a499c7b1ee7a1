"""Build the native C++ pieces (g++ -O3 shared libraries).

Usage: python -m rade_tpu.native.build
Artifacts land next to the sources (librade_flac.so) and are loaded lazily
via ctypes; the loaders rebuild automatically when the source is newer.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

HERE = Path(__file__).parent

TARGETS = {
    "librade_flac.so": ["flacdec.cpp"],
    "librade_loader.so": ["loader.cpp", "flacdec.cpp", "flacenc.cpp"],
}


def build(force: bool = False) -> None:
    for lib, sources in TARGETS.items():
        out = HERE / lib
        srcs = [HERE / s for s in sources]
        if (
            not force
            and out.exists()
            and all(out.stat().st_mtime >= s.stat().st_mtime for s in srcs)
        ):
            continue
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
            "-o", str(out), *[str(s) for s in srcs],
        ]
        print("+", " ".join(cmd))
        subprocess.run(cmd, check=True)


if __name__ == "__main__":
    build(force=True)
    print("native build ok")
