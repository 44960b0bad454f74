"""Unit tests for scripts/ref_baseline/torch04_compat.py.

The reference-measurement harness (scripts/ref_baseline/) rebuilds the
torch-0.4 LAPACK wrappers the reference calls on top of torch.linalg;
these tests pin the legacy semantics (upper-by-default potrf, tuple
returns, (n, 2) real/imag eig) so the measured baseline is trustworthy.
"""

import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1] /
                       "scripts" / "ref_baseline"))

import torch04_compat  # noqa: E402

torch04_compat.install()


@pytest.fixture
def spd():
    torch.manual_seed(0)
    a = torch.randn(5, 5, dtype=torch.float64)
    return a @ a.T + 5.0 * torch.eye(5, dtype=torch.float64)


def test_potrf_upper_by_default(spd):
    u = spd.potrf()
    assert torch.allclose(u, u.triu())
    assert torch.allclose(u.T @ u, spd)
    low = torch.potrf(spd, upper=False)
    assert torch.allclose(low, low.tril())
    assert torch.allclose(low @ low.T, spd)


def test_potrs_solves_via_factor(spd):
    b = torch.randn(5, 3, dtype=torch.float64)
    x = b.potrs(spd.potrf())
    assert torch.allclose(spd @ x, b)
    # 1-D right-hand sides are accepted (reference constraint.py:239
    # flattens the result).
    x1 = torch.potrs(b[:, 0], spd.potrf())
    assert torch.allclose(x1.flatten(), x[:, 0])


def test_gesv_returns_solution_tuple(spd):
    b = torch.randn(5, 2, dtype=torch.float64)
    x, _ = torch.gesv(b, spd)
    assert torch.allclose(spd @ x, b)
    x_m, _ = b.gesv(spd)  # legacy Tensor method: b.gesv(A)
    assert torch.allclose(x_m, x)


def test_trtrs_triangular_and_transpose(spd):
    low = torch.potrf(spd, upper=False)
    b = torch.randn(5, 2, dtype=torch.float64)
    x, _ = torch.trtrs(b, low, upper=False)
    assert torch.allclose(low @ x, b)
    xt, _ = torch.trtrs(b, low, upper=False, transpose=True)
    assert torch.allclose(low.T @ xt, b)


def test_eig_legacy_real_imag_layout(spd):
    e, v = spd.clone().eig(True)
    assert e.shape == (5, 2)
    assert torch.allclose(e[:, 1], torch.zeros(5, dtype=torch.float64))
    # Reconstruct: V diag(e) V^-1 == A for the symmetric case.
    recon = v @ torch.diag(e[:, 0]) @ torch.linalg.inv(v)
    assert torch.allclose(recon, spd, atol=1e-8)
