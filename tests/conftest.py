import os
from pathlib import Path

# CI/tests run on the CPU backend with 8 virtual devices so sharding tests
# exercise a multi-chip mesh without TPU hardware (SURVEY.md section 4).
# Note: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the
# env var alone is not enough — override the config after import too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

DATA_DIR = Path(__file__).resolve().parent / "data"

# Golden tag counts from the reference integration suite
# (reference: tests/test_detector.rs:25-33).
GOLDEN_COUNTS = {
    "calib_sample": 36,  # bundled data/ frame (BASELINE config 1)
    "iphone": 66,
    "EuRoC": 36,
    "TUM_VI": 36,
    "right": 36,
    "r45": 36,
    "top": 36,
    "two_boards": 72,
}


@pytest.fixture(scope="session")
def data_dir() -> Path:
    return DATA_DIR
