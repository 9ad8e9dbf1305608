import numpy as np
import jax.numpy as jnp
import pytest

from pairwise_perturbation_tpu.ops import contract, dimtree


def test_binary_parent_map_order4():
    parent = dimtree.binary_parent_map(4)
    assert parent[(0, 1)] == (0, 3)
    assert parent[(2, 3)] == (0, 3)
    assert parent[(0, 0)] == (0, 1)
    assert parent[(3, 3)] == (2, 3)


@pytest.mark.parametrize("shape", [(5, 6, 7), (4, 5, 6, 7), (3, 4, 3, 4, 3, 4)])
def test_binary_tree_mttkrp_matches_exact(rng, shape):
    V = rng.standard_normal(shape)
    Ws = [rng.standard_normal((s, 3)) for s in shape]
    jV, jWs = jnp.asarray(V), [jnp.asarray(W) for W in Ws]
    sweep = dimtree.BinaryTreeSweep(jV, jWs)
    for i in range(len(shape)):
        got = sweep.mttkrp(i)
        want = contract.mttkrp(jV, jWs, i)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9)


def test_binary_tree_staleness_semantics(rng):
    """Nodes built earlier in a sweep must NOT see later factor updates
    (matches the reference's per-sweep mttkrp_map cache)."""
    shape = (4, 5, 6, 7)
    V = rng.standard_normal(shape)
    Ws = [rng.standard_normal((s, 3)) for s in shape]
    jV, jWs = jnp.asarray(V), [jnp.asarray(W) for W in Ws]
    sweep = dimtree.BinaryTreeSweep(jV, jWs)
    m0 = sweep.mttkrp(0)  # builds node (0,1) with current W2, W3
    # mutate factor 2 in the sweep's factor list (as the ALS loop does)
    sweep.factors[2] = jnp.asarray(rng.standard_normal((6, 3)))
    m1 = sweep.mttkrp(1)  # uses cached node (0,1): must not reflect new W2
    want = contract.mttkrp(jV, jWs, 1)  # with ORIGINAL W2
    np.testing.assert_allclose(np.asarray(m1), np.asarray(want), rtol=1e-9)


def test_chain_tree_structure():
    parent, cpos = dimtree.chain_tree(3)
    # top (0,1,2): construct child (0,1) via contracting pos 2;
    # right child (0,2) via contracting pos 1
    assert parent[(0, 1)] == (0, 1, 2) and cpos[(0, 1)] == 2
    assert parent[(0, 2)] == (0, 1, 2) and cpos[(0, 2)] == 1
    assert parent[(0,)] == (0, 1) and cpos[(0,)] == 1
    assert parent[(1,)] == (0, 1) and cpos[(1,)] == 0
    assert parent[(2,)] == (0, 2) and cpos[(2,)] == 0


@pytest.mark.parametrize("left_index", [0, 1, 2, 3])
def test_chain_tree_mttkrp_matches_exact(rng, left_index):
    shape = (4, 5, 6, 7)
    order = len(shape)
    V = rng.standard_normal(shape)
    Ws = [rng.standard_normal((s, 3)) for s in shape]
    jV, jWs = jnp.asarray(V), [jnp.asarray(W) for W in Ws]
    indexes = [(i % order) for i in range(left_index + 1, left_index + order)]
    sweep = dimtree.ChainTreeSweep(jV, jWs, indexes, left_index)
    for pos in range(order - 1):
        got = sweep.mttkrp(pos)
        want = contract.mttkrp(jV, jWs, indexes[pos])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9)
