import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    """Compile the native RLE kit alongside the Python package (optional)."""

    def run(self):
        super().run()
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-o", os.path.join(here, "edt_tpu", "native", "_edt_rle.so"),
                 os.path.join(here, "edt_tpu", "native", "rle.cpp")],
                check=True,
            )
        except Exception as exc:  # fall back to NumPy implementations
            print(f"[edt_tpu] native RLE build skipped: {exc}")


# metadata lives in pyproject.toml; this file only hooks the optional
# native build into the packaging pipeline
setup(cmdclass={"build_py": BuildWithNative})
