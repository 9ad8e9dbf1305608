"""Native C++ component tests (builds native/libppnative.so with g++)."""

import numpy as np
import pytest

from pairwise_perturbation_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "native lib failed to build/load"


def test_plan_chain_priority_matches_fallback():
    sizes, rank = [3, 128, 128, 7200], 10
    pr, peak = native.plan_chain_priority(sizes, rank)
    assert pr[0] == 3  # largest mode first
    assert set(pr) == {0, 1, 2, 3}
    # peak = full tensor size (before any contraction)
    assert peak >= float(np.prod([float(s) for s in sizes]))


def test_plan_tree_split_reasonable():
    s, fl = native.plan_tree_split([3, 128, 128, 7200], 10)
    assert 0 <= s <= 2
    assert np.isfinite(fl) and fl > 0
    # uniform sizes -> middle split is optimal (matches the reference's
    # fixed halving)
    s2, _ = native.plan_tree_split([50] * 6, 6)
    assert s2 == 2


def test_pp_cache_flops_positive():
    fl = native.pp_cache_flops([20, 20, 20, 20], 5)
    assert fl > 0


def test_native_loader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    V = rng.standard_normal((13, 7, 5))
    p = str(tmp_path / "t.bin")
    V.astype("<f8").tofile(p)
    out = native.load_f64_as_f32(p, (13, 7, 5))
    assert out is not None
    np.testing.assert_allclose(out, V.astype(np.float32))
    out64 = native.load_f64(p, (13, 7, 5))
    np.testing.assert_allclose(out64, V)


def test_io_uses_native(tmp_path):
    from pairwise_perturbation_tpu.utils import io as ppio
    rng = np.random.default_rng(1)
    V = rng.standard_normal((8, 9))
    p = str(tmp_path / "u.bin")
    ppio.write_dense_binary(p, V)
    back = ppio.read_dense_binary(p, (8, 9), out_dtype=np.float32)
    np.testing.assert_allclose(back, V.astype(np.float32))
