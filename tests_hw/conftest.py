"""Hardware (real-TPU) parity suite — run with: python -m pytest tests_hw -q

Unlike tests/ (which forces an 8-device virtual CPU mesh), this suite runs
on the ambient backend — the axon TPU tunnel — in compiled (Mosaic) mode.
It is the CI gate for Mosaic lowering regressions the interpret-mode tests
cannot see (VERDICT r2 weak #4).
"""

import pytest

from lt_tpu.utils.cache import enable_compilation_cache


def pytest_configure(config):
    enable_compilation_cache()


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("hardware suite needs a TPU backend", allow_module_level=True)
