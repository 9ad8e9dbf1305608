from pairwise_perturbation_tpu.ops import contract, solve, dimtree

__all__ = ["contract", "solve", "dimtree"]
