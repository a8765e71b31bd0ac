"""Test configuration.

Tests run on CPU by default with 8 virtual devices so the multi-chip
sharded paths can be exercised without TPU hardware. Set
EDT_TPU_TEST_PLATFORM=tpu to run against a real chip instead.
"""

import os

_platform = os.environ.get("EDT_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(1337)
