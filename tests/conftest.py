"""Test configuration.

Tests run on CPU by default with 8 virtual devices so the multi-chip
sharded paths can be exercised without TPU hardware. Set
EDT_TPU_TEST_PLATFORM=tpu to run against a real chip instead.

Note: this environment's TPU plugin imports jax from sitecustomize at
interpreter start, so plain env vars are too late — we force the platform
through jax.config (works as long as no backend has been initialized yet).
"""

import os

_platform = os.environ.get("EDT_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(1337)
