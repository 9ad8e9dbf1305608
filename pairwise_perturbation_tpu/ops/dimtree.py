"""Dimension-tree structures for DT-ALS and MSDT-ALS.

Two tree families, mirroring the two generations in the reference:

1. **Binary dimension tree** (legacy engine): recursively halve the mode
   range; each node holds V contracted with all factors outside its range.
   Reference: ``Construct_Dimension_Tree`` (common.cxx:225-270) +
   ``mttkrp_map_DT`` (common.cxx:20-133).

2. **Chain (caterpillar) tree** (second-gen ``src/optimizer``): after a
   first-level contraction V x W[left_index], each node drops one position;
   two branches per node (drop-last / keep-last-drop-second-last).
   Reference: ``Construct_Subtree`` / ``Right_Subtree``
   (cp_dt_optimizer.cxx:67-124).

Nodes here are identified by tuples of original mode ids (binary tree:
contiguous (lo, hi) ranges) — no string-einsum keys. Node tensors are built
lazily inside a per-sweep memo so each sweep sees exactly the reference's
cache-freshness semantics (a node built early in the sweep is *not* rebuilt
after later factors update).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pairwise_perturbation_tpu.ops import contract


def binary_children(lo: int, hi: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    mid = (lo + hi) // 2
    return (lo, mid), (mid + 1, hi)


def binary_parent_map(order: int, root_split: int = None
                      ) -> Dict[Tuple[int, int], Tuple[int, int]]:
    """parent[(lo, hi)] for every non-root node of the binary tree.

    ``root_split``: mode index s ending the root's left child
    ([0, s] / [s+1, order-1]); None = the reference's fixed midpoint
    (common.cxx:252). The native planner (native/planner.cpp
    plan_tree_split) picks s minimizing one sweep's FLOPs — on skewed
    shapes like coil-100 the asymmetric split saves ~20% (the huge mode
    gets its own top-level node, which IS its leaf). Deeper levels stay
    midpoint.
    """
    parent: Dict[Tuple[int, int], Tuple[int, int]] = {}

    def rec(lo: int, hi: int, split: int = None):
        if lo == hi:
            return
        if split is None:
            (l0, l1), (r0, r1) = binary_children(lo, hi)
        else:
            (l0, l1), (r0, r1) = (lo, split), (split + 1, hi)
        parent[(l0, l1)] = (lo, hi)
        parent[(r0, r1)] = (lo, hi)
        rec(l0, l1)
        rec(r0, r1)

    rec(0, order - 1, root_split)
    return parent


class BinaryTreeSweep:
    """Lazy per-sweep node cache for the binary dimension tree.

    ``node(lo, hi)`` returns V contracted (Khatri-Rao-style) with every
    factor outside [lo, hi]; axes = modes lo..hi (ascending) + rank.
    The root is V itself (no rank axis). Children of the root are built
    directly from V (matching mttkrp_map_DT's top-level special case,
    common.cxx:29-88); deeper nodes from their parent.
    """

    def __init__(self, V, factors: Sequence, precision=None, layouts=None,
                 root_split: int = None):
        self.V = V
        self.factors = list(factors)
        self.order = V.ndim
        self.precision = precision
        self.layouts = layouts
        self.parent = binary_parent_map(self.order, root_split)
        self._memo: Dict[Tuple[int, int], object] = {}

    def node(self, lo: int, hi: int):
        key = (lo, hi)
        if key in self._memo:
            return self._memo[key]
        order = self.order
        if key == (0, order - 1):
            raise ValueError("root node is V itself; query children instead")
        plo, phi = self.parent[key]
        if (plo, phi) == (0, order - 1):
            # top-level node: contract directly from V
            T = self.V
            rem = tuple(range(order))
            has_rank = False
        else:
            T = self.node(plo, phi)
            rem = tuple(range(plo, phi + 1))
            has_rank = True
        to_contract = [m for m in range(plo, phi + 1) if not lo <= m <= hi]
        priority = contract.contraction_priority(self.V.shape)
        if not has_rank and len(to_contract) > 1 and not self.layouts:
            # top-level node straight from V: one fused einsum — XLA skips
            # materializing the first-level intermediate (single consumer)
            T, rem = contract.fused_partial_mttkrp(
                self.V, self.factors,
                contract.order_by_priority(to_contract, priority),
                precision=self.precision)
            has_rank = True
        else:
            for m in contract.order_by_priority(to_contract, priority):
                if not has_rank:
                    T, rem = contract.first_contraction(
                        self.V, self.layouts, self.factors[m], m,
                        precision=self.precision)
                else:
                    T, rem = contract.contract_mode_kr(
                        T, rem, has_rank, self.factors[m], m,
                        precision=self.precision)
                has_rank = True
        self._memo[key] = T
        return T

    def mttkrp(self, i: int):
        """M_i from the tree: leaf node (i, i) -> matrix (s_i, R)."""
        return self.node(i, i)


# ---------------------------------------------------------------------------
# Chain tree (second-gen DT / MSDT optimizers)
# ---------------------------------------------------------------------------


def chain_tree(n_positions: int):
    """Build the caterpillar tree over *positions* 0..n_positions-1.

    Returns (parent, contract_pos) dicts keyed by position tuples.
    ``parent[node]`` is the node it is contracted from; ``contract_pos[node]``
    is the single position whose factor is applied in that step.
    Mirrors Construct_Subtree / Right_Subtree (cp_dt_optimizer.cxx:67-124).
    """
    parent: Dict[Tuple[int, ...], Tuple[int, ...]] = {}
    contract_pos: Dict[Tuple[int, ...], int] = {}

    def construct(top: Tuple[int, ...]):
        right(top)
        child = top[:-1]
        parent[child] = top
        contract_pos[child] = top[-1]
        if len(child) > 1:
            construct(child)

    def right(top: Tuple[int, ...]):
        child = top[:-2] + (top[-1],)
        parent[child] = top
        contract_pos[child] = top[-2]
        if len(child) > 1:
            right(child)

    top = tuple(range(n_positions))
    construct(top)
    return parent, contract_pos


class ChainTreeSweep:
    """Lazy node cache for the chain tree used by DT/MSDT optimizer steps.

    ``indexes[pos]`` maps tree positions to actual mode ids (the rotating
    assignment of CPMSDTOptimizer::update_indexes). The top node is the
    first-level contraction V x W[left_index] (mttkrp_map_init,
    cp_msdt_optimizer.cxx:111-144); every other node contracts one more
    factor. Node axes: remaining positions' modes in *position order*
    followed by the rank axis.
    """

    def __init__(self, V, factors: Sequence, indexes: Sequence[int],
                 left_index: int, precision=None, top=None):
        self.V = V
        self.factors = list(factors)
        self.indexes = list(indexes)
        self.left_index = left_index
        self.order = V.ndim
        self.precision = precision
        n = self.order - 1
        self.parent, self.contract_pos = chain_tree(n)
        self._memo: Dict[Tuple[int, ...], object] = {}
        self._top = tuple(range(n))
        if top is not None:
            # preset first-level contraction (LR-cached optimizers inject
            # their cached/updated tensor here, cp_dt_lr_optimizer.cxx:95-100)
            self._memo[self._top] = top

    def _mode_of(self, pos: int) -> int:
        return self.indexes[pos]

    def _axes_of(self, node: Tuple[int, ...]) -> Tuple[int, ...]:
        return tuple(self._mode_of(p) for p in node)

    def top(self):
        """First-level contraction: V contracted with W[left_index]."""
        if self._top in self._memo:
            return self._memo[self._top]
        T, rem2 = contract.first_contraction(
            self.V, None, self.factors[self.left_index],
            self.left_index, precision=self.precision)
        # reorder axes to position order (indexes order) + rank.
        axes_current = list(rem2)  # ascending mode ids
        desired = [self._mode_of(p) for p in self._top]
        perm = [axes_current.index(m) for m in desired] + [len(axes_current)]
        T = T.transpose(perm)
        self._memo[self._top] = T
        return T

    def node(self, node: Tuple[int, ...]):
        if node == self._top:
            return self.top()
        if node in self._memo:
            return self._memo[node]
        par = self.parent[node]
        T = self.node(par)
        # contract position cpos's mode with its factor, Khatri-Rao in rank.
        # Axis bookkeeping uses mode ids in *position order* (contract_mode_kr
        # only needs .index(), not ascending order).
        cpos = self.contract_pos[node]
        mode = self._mode_of(cpos)
        par_mode_axes = self._axes_of(par)
        T2, _ = contract.contract_mode_kr(
            T, par_mode_axes, True, self.factors[mode], mode,
            precision=self.precision)
        self._memo[node] = T2
        return T2

    def mttkrp(self, pos: int):
        """M for the mode at tree position ``pos`` (leaf node (pos,))."""
        return self.node((pos,))
