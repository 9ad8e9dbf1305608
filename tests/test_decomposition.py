"""Equivalent of the reference's only test binary
(tests/test_decomposition.cxx): constructor/shape assertions plus a
30-sweep order-6 size-13 rank-5 CPD run with the DT optimizer writing a
results CSV — with actual convergence assertions added on top.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pairwise_perturbation_tpu.models import cp, optimizers as opt
from pairwise_perturbation_tpu.utils.metrics import PlotFile


def test_decomposition_constructor_state():
    """TEST_decomposition (tests/test_decomposition.cxx:15-36)."""
    d = opt.Decomposition(6, 13, 5)
    assert d.order == 6
    assert d.sizes == [13] * 6
    assert d.ranks == [5] * 6
    V = jnp.zeros((13,) * 6)
    W = [jnp.zeros((13, 5))] * 6
    d.Init(V, W)
    assert d.V.shape == (13,) * 6
    # shape validation fires
    with pytest.raises(AssertionError):
        d2 = opt.Decomposition(6, 13, 5)
        d2.Init(jnp.zeros((12,) * 6), W)


def test_cpd_order6_30_sweeps(tmp_path):
    """TEST_CPD (tests/test_decomposition.cxx:38-66): order-6, size-13,
    rank-5 random tensor, 30 sweeps with the DT optimizer, CSV written.
    The reference has no assertions (pass == doesn't crash); we assert the
    residual decreased and the CSV exists."""
    key = jax.random.PRNGKey(0)
    V = jax.random.uniform(key, (13,) * 6, dtype=jnp.float64)
    W = cp.init_factors(V.shape, 5, dtype=jnp.float64)
    model = opt.CPD(6, 13, 5, opt.CPDTOptimizer(6, 5))
    model.Init(V, W)
    csv_path = str(tmp_path / "test.csv")
    plot = PlotFile(csv_path, PlotFile.CP_HEADER, echo=False)
    model.als(tol=1e-10, timelimit=1e4, maxsweep=30, resprint=5, plot=plot)
    plot.close()
    assert os.path.exists(csv_path)
    diffs = [h["diffV"] for h in model.history]
    assert diffs[-1] < diffs[0]
