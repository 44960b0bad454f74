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


def test_uint8_mask_indexing_like_torch04():
    """The reference's boxqp builds clamped/free masks as uint8
    ByteTensors (constraint.py:173-174) and indexes with them — torch-0.4
    mask semantics. Get, set, and the Qfree = Q[free][:, free] submatrix
    pattern (constraint.py:219) must all work."""
    x = torch.arange(6, dtype=torch.float64)
    mask = torch.tensor([1, 0, 1, 0, 1, 0], dtype=torch.uint8)
    assert torch.equal(x[mask], torch.tensor([0.0, 2.0, 4.0],
                                             dtype=torch.float64))
    y = x.clone()
    y[mask] = -1.0
    assert torch.equal(y, torch.tensor([-1.0, 1.0, -1.0, 3.0, -1.0, 5.0],
                                       dtype=torch.float64))
    Q = torch.arange(36, dtype=torch.float64).reshape(6, 6)
    sub = Q[mask][:, mask]
    assert sub.shape == (3, 3)
    assert sub[0, 0] == Q[0, 0] and sub[2, 2] == Q[4, 4]
    # Integer (non-uint8) indexing is untouched.
    assert float(x[torch.tensor([3])]) == 3.0


def test_boxqp_runs_with_shims():
    """End-to-end: the reference's own boxqp must complete under the
    shims (it previously raised on uint8 masks, sending every constrained
    backward pass to MAX_REG)."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] /
                           "scripts" / "ref_baseline" / "gym_stub"))
    sys.path.insert(0, "/root/reference")
    pytest.importorskip("pddp.utils.constraint")
    from pddp.utils.constraint import boxqp

    torch.manual_seed(0)
    A = torch.randn(3, 3)
    Q = A @ A.T + 3.0 * torch.eye(3)
    c = torch.randn(3)
    lower, upper = -0.5 * torch.ones(3), 0.5 * torch.ones(3)
    x, result, _, free = boxqp(torch.zeros(3), Q, c, lower, upper)
    assert result != 0  # terminated with a definite status
    assert bool(((x >= lower - 1e-9) & (x <= upper + 1e-9)).all())
    # KKT check on free dimensions: gradient ~ 0 where unclamped.
    g = Q @ x + c
    assert float(g[free.bool()].abs().max()) < 1e-5
