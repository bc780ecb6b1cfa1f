"""Compiled-mode Pallas-vs-XLA parity on the real chip (pytest wrapper
around benchmarks/hw_parity.py's case registry)."""

import pytest

from benchmarks import hw_parity

FAST = [n for n in hw_parity.CASES if "flagship" not in n]
SLOW = [n for n in hw_parity.CASES if "flagship" in n]


@pytest.mark.hardware
@pytest.mark.parametrize("name", FAST)
def test_kernel_parity(name):
    got, ref, tol = hw_parity.CASES[name]()
    err = hw_parity.rel_err(got, ref)
    assert err <= tol, f"{name}: err {err:.3e} > tol {tol:g}"


@pytest.mark.hardware
@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_full_model_parity(name):
    got, ref, tol = hw_parity.CASES[name]()
    err = hw_parity.rel_err(got, ref)
    assert err <= tol, f"{name}: err {err:.3e} > tol {tol:g}"
