import os
import subprocess

from setuptools import setup, find_packages
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


setup(
    name="edt-tpu",
    version="0.1.0",
    description=(
        "TPU-native multi-label anisotropic Euclidean distance transform "
        "(JAX/Pallas), differentiable and multi-chip shardable"
    ),
    packages=find_packages(include=["edt_tpu", "edt_tpu.*"]),
    package_data={"edt_tpu.native": ["rle.cpp"]},
    python_requires=">=3.10",
    install_requires=["jax", "numpy"],
    cmdclass={"build_py": BuildWithNative},
)
