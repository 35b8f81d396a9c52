import os
import pathlib

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver benches on a real chip).
# NOTE: this environment force-sets JAX_PLATFORMS=axon, so the env var is
# not enough — use the config API, which wins.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

HERE = pathlib.Path(__file__).parent
MATRIX = HERE / "Matrix"
EXPECTED = HERE / "Expected"

# Same modulus grid as the reference test-suite
# (/root/reference/tests/CMakeLists.txt:46-53): hits the float / double /
# int64 datatype regimes of the reference and the 2^32-5 extreme.
ALL_MODULI = [3, 257, 65537, 67108859, 189812507, 4294967291]

SMALL_MODULI = [3, 257, 65537]


@pytest.fixture
def matrix_dir():
    return MATRIX


@pytest.fixture
def expected_dir():
    return EXPECTED


def fixture_path(name: str) -> pathlib.Path:
    return MATRIX / name


ALL_TEST_MATRICES = sorted(p.name for p in MATRIX.glob("*.sms")
                           if p.name not in ("trefethen_2000.sms",
                                             "tridiagonal.sms"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: large end-to-end instances (run explicitly or "
        "in full CI; deselect with -m 'not slow')")
