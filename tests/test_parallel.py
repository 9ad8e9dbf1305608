"""Sharding tests on the virtual 8-device CPU mesh.

Validates: layout planning, padding invisibility, explicit shard_map MTTKRP
vs replicated, and end-to-end sharded ALS == unsharded ALS (the reference's
np-invariance property, run.cxx:292-322)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pairwise_perturbation_tpu.models import cp
from pairwise_perturbation_tpu.ops import contract
from pairwise_perturbation_tpu.parallel import mesh as pmesh


def test_plan_layout_largest_modes():
    mesh = pmesh.make_mesh((2, 4), ("x", "y"))
    layout = pmesh.plan_layout((3, 50, 7, 40), mesh)
    # largest mode (50) -> largest axis (y=4), next (40) -> x=2
    assert layout.mode_axis == {1: "y", 3: "x"}
    assert layout.padded_shape == (3, 52, 7, 40)


def test_sharded_mttkrp_matches_replicated(rng):
    mesh = pmesh.make_mesh((2, 4), ("x", "y"))
    shape = (6, 9, 10, 5)
    V = rng.standard_normal(shape)
    Ws = [rng.standard_normal((s, 4)) for s in shape]
    layout = pmesh.plan_layout(shape, mesh, modes=(2, 1))
    Vs = pmesh.shard_tensor(V, layout)
    Wss = pmesh.shard_factors(Ws, layout)
    for mode in range(len(shape)):
        got = pmesh.sharded_mttkrp(Vs, Wss, mode, layout)
        want = contract.mttkrp(jnp.asarray(V), [jnp.asarray(W) for W in Ws],
                               mode)
        got_np = np.asarray(got)[:shape[mode], :]
        np.testing.assert_allclose(got_np, np.asarray(want), rtol=1e-9)


def test_padding_is_invisible_to_dt_sweep(rng):
    """DT sweep on padded+sharded inputs == unsharded sweep on originals."""
    mesh = pmesh.make_mesh((8,), ("x",))
    shape = (6, 9, 10, 5)  # mode 2 (size 10) padded to 16 over 8 devices
    V = rng.standard_normal(shape)
    Ws = [rng.standard_normal((s, 3)) for s in shape]
    layout = pmesh.plan_layout(shape, mesh)
    Vs = pmesh.shard_tensor(V, layout)
    Wss = pmesh.shard_factors(Ws, layout)
    lam = jnp.asarray(0.0)
    Ws_sharded, _ = cp.dt_sweep(Vs, Wss, lam, solver="svd")
    Ws_plain, _ = cp.dt_sweep(jnp.asarray(V), [jnp.asarray(W) for W in Ws],
                              lam, solver="svd")
    out = pmesh.unshard_factors(Ws_sharded, layout)
    for a, b in zip(out, Ws_plain):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-8, atol=1e-10)
    # padded rows stayed zero
    full = np.asarray(Ws_sharded[2])
    assert np.allclose(full[shape[2]:, :], 0.0)


def test_sharded_pp_end_to_end_matches_unsharded(rng):
    mesh = pmesh.make_mesh((4, 2), ("x", "y"))
    shape = (6, 8, 8, 6)
    Ws_true = [rng.random((s, 3)) for s in shape]
    V = np.asarray(contract.build_dense([jnp.asarray(W) for W in Ws_true]))
    W0 = cp.init_factors(shape, 3, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=0.1, maxiter=30, resprint=10)

    res_plain = cp.als_cp_pp(V, [jnp.array(w) for w in W0], cfg)

    layout = pmesh.plan_layout(shape, mesh)
    Vs = pmesh.shard_tensor(V, layout)
    Wss = pmesh.shard_factors(W0, layout)
    res_shard = cp.als_cp_pp(Vs, Wss, cfg)

    np.testing.assert_allclose(res_shard.diffV, res_plain.diffV,
                               rtol=1e-6, atol=1e-9)
    outs = pmesh.unshard_factors(res_shard.factors, layout)
    for a, b in zip(outs, res_plain.factors):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-5, atol=1e-8)


def test_constrained_pp_caches_match_unconstrained(rng):
    from pairwise_perturbation_tpu.ops import contract as ctr
    mesh = pmesh.make_mesh((4, 2), ("x", "y"))
    shape = (6, 8, 8, 6)
    V = rng.standard_normal(shape)
    Ws = [rng.standard_normal((s, 3)) for s in shape]
    layout = pmesh.plan_layout(shape, mesh)
    Vs = pmesh.shard_tensor(V, layout)
    Wss = pmesh.shard_factors(Ws, layout)
    single_c, pair_c = pmesh.constrained_pp_caches(Vs, Wss, layout)
    single_p, pair_p = ctr.build_pp_caches(jnp.asarray(V),
                                           [jnp.asarray(W) for W in Ws])
    for i in single_p:
        got = np.asarray(single_c[i])[:shape[i], :]
        np.testing.assert_allclose(got, np.asarray(single_p[i]), rtol=1e-9)
    for (i, j) in pair_p:
        # rank-major caches: (R, s_i, s_j)
        got = np.asarray(pair_c[(i, j)])[:, :shape[i], :shape[j]]
        np.testing.assert_allclose(got, np.asarray(pair_p[(i, j)]),
                                   rtol=1e-9)


def test_sharded_dt_sweep_compiles_to_collectives(rng):
    """The GSPMD-partitioned DT sweep must lower to collective reductions
    over the mesh (psum/reduce-scatter of partial MTTKRPs) and must NOT
    all-gather the full V onto every device — the CTF-equivalent
    communication pattern (SURVEY.md section 2.6)."""
    import jax
    import jax.numpy as jnp
    from pairwise_perturbation_tpu.models import cp
    from pairwise_perturbation_tpu.parallel import mesh as pmesh

    shape, R = (8, 12, 16, 32), 3
    V = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    Ws = cp.init_factors(shape, R, dtype=jnp.float32)
    mesh = pmesh.make_mesh((8,))
    layout = pmesh.plan_layout(shape, mesh)
    Vs = pmesh.shard_tensor(V, layout)
    Wss = pmesh.shard_factors(Ws, layout)
    lam = jnp.asarray(0.0, dtype=jnp.float32)

    fn = jax.jit(lambda V, Ws, lam: cp.dt_sweep.__wrapped__(
        V, Ws, lam, None, solver="svd"))
    hlo = fn.lower(Vs, list(Wss), lam).compile().as_text()
    assert "all-reduce" in hlo or "reduce-scatter" in hlo, \
        "no collective reduction in the partitioned sweep"
    # V must stay sharded: no all-gather producing a full-V-sized operand
    full_v_shape = f"f32[{','.join(str(s) for s in layout.padded_shape)}]"
    for line in hlo.splitlines():
        if "all-gather" in line and full_v_shape in line:
            raise AssertionError(f"full V gathered: {line[:160]}")
