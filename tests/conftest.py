"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; real multi-chip TPU hardware is not
available in CI, so we ask XLA for 8 host-platform devices. Must run before
jax initializes its backends, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU platform and
# overrides jax_platforms at interpreter start; undo that for tests (they
# must run on the virtual 8-device CPU mesh).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # precision tests compare vs LAPACK

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(51)  # the reference's eval seed (benchmark_utils.py:27)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full suite)",
    )


def pytest_collection_modifyitems(config, items):
    """Default runs skip @pytest.mark.slow (heavy integration/compile tests)
    to keep the edit-test loop under a few minutes; `--runslow` or an
    explicit `-m slow` selection runs everything."""
    if config.getoption("--runslow"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return
    skip_slow = pytest.mark.skip(reason="slow: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
