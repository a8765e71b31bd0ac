"""Build the native RLE kit: python -m edt_tpu.native.build

Compiles rle.cpp into _edt_rle.so next to this file. Safe to re-run;
skipped automatically when the .so is newer than the source.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "rle.cpp")
OUT = os.path.join(HERE, "_edt_rle.so")


def build(force=False):
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", OUT, SRC,
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path)
