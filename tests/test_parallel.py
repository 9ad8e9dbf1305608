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


def test_sharded_tucker_matches_unsharded(rng):
    """Tucker DT sweep + PP caches on a padded+sharded V match the
    unsharded run (padding invisibility for mode Grams and TTMc)."""
    from pairwise_perturbation_tpu.models import tucker
    mesh = pmesh.make_mesh((8,), ("x",))
    shape, ranks = (6, 9, 10, 5), (2, 3, 3, 2)
    V = rng.standard_normal(shape)
    layout = pmesh.plan_layout(shape, mesh)
    Vs = pmesh.shard_tensor(V, layout)

    core_p, Ws_p = tucker.hosvd(jnp.asarray(V), ranks)
    core_s, Ws_s = tucker.hosvd(Vs, ranks)
    for m, (a, b) in enumerate(zip(Ws_s, Ws_p)):
        got = np.asarray(a)[:shape[m], :]
        np.testing.assert_allclose(np.abs(got), np.abs(np.asarray(b)),
                                   rtol=1e-6, atol=1e-8)
        # padded rows are zero
        assert np.allclose(np.asarray(a)[shape[m]:, :], 0.0)
    np.testing.assert_allclose(np.abs(np.asarray(core_s)),
                               np.abs(np.asarray(core_p)),
                               rtol=1e-6, atol=1e-8)

    Ws1_p, core1_p = tucker.tucker_dt_sweep(jnp.asarray(V), list(Ws_p),
                                            list(Ws_p), ranks=ranks,
                                            use_sign=True)
    Ws1_s, core1_s = tucker.tucker_dt_sweep(Vs, list(Ws_s), list(Ws_s),
                                            ranks=ranks, use_sign=True)
    for m, (a, b) in enumerate(zip(Ws1_s, Ws1_p)):
        np.testing.assert_allclose(np.abs(np.asarray(a)[:shape[m], :]),
                                   np.abs(np.asarray(b)),
                                   rtol=1e-5, atol=1e-7)


def test_sharded_msdt_cycle_matches_unsharded(rng):
    from pairwise_perturbation_tpu.models import optimizers as ppopt
    mesh = pmesh.make_mesh((8,), ("x",))
    shape, R = (6, 9, 16, 5), 3
    V = rng.standard_normal(shape)
    W0 = cp.init_factors(shape, R, dtype=jnp.float64)
    lam = jnp.asarray(0.0)
    layout = pmesh.plan_layout(shape, mesh)
    Vs = pmesh.shard_tensor(V, layout)
    Wss = pmesh.shard_factors(W0, layout)
    out_p, _ = ppopt.msdt_cycle(jnp.asarray(V), list(W0), lam,
                                start_left=len(shape) - 1)
    out_s, _ = ppopt.msdt_cycle(Vs, list(Wss), lam,
                                start_left=len(shape) - 1)
    for m, (a, b) in enumerate(zip(out_s, out_p)):
        np.testing.assert_allclose(np.asarray(a)[:shape[m], :],
                                   np.asarray(b), rtol=1e-7, atol=1e-9)


def test_sharded_fused_pp_matches_unsharded(rng):
    shape = (6, 8, 8, 6)
    Ws_true = [rng.random((s, 3)) for s in shape]
    V = np.asarray(contract.build_dense([jnp.asarray(W) for W in Ws_true]))
    W0 = cp.init_factors(shape, 3, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=0.1, maxiter=25, resprint=5)
    res_plain = cp.als_cp_pp_fused(V, [jnp.array(w) for w in W0], cfg,
                                   chunk=8)
    mesh = pmesh.make_mesh((4, 2), ("x", "y"))
    layout = pmesh.plan_layout(shape, mesh)
    Vs = pmesh.shard_tensor(V, layout)
    Wss = pmesh.shard_factors(W0, layout)
    res_shard = cp.als_cp_pp_fused(Vs, Wss, cfg, chunk=8)
    np.testing.assert_allclose(res_shard.diffV, res_plain.diffV,
                               rtol=1e-5, atol=1e-8)


def test_cli_mesh_tucker_and_run(tmp_path):
    """-mesh is honored by the Tucker test_als branch and cmd_run."""
    from pairwise_perturbation_tpu import cli
    out = tmp_path / "t.csv"
    rc = cli.main(["test_als", "-model", "Tucker", "-tensor", "r2",
                   "-dim", "4", "-size", "12", "-rank", "3", "-maxiter", "6",
                   "-resprint", "2", "-mesh", "8", "-quiet",
                   "-filename", str(out)])
    assert rc == 0
    rows = out.read_text().strip().splitlines()
    assert len(rows) > 2
    first, last = rows[1].split(","), rows[-1].split(",")
    assert float(last[5]) <= float(first[5])  # diffV decreased

    out2 = tmp_path / "r.csv"
    rc = cli.main(["run", "-tensor", "r", "-dim", "4", "-size", "12",
                   "-rank", "3", "-pp", "1", "-maxiter", "8", "-resprint",
                   "2", "-mesh", "4x2", "-quiet", "-filename", str(out2)])
    assert rc == 0
    rows = out2.read_text().strip().splitlines()
    assert len(rows) > 2
    first, last = rows[1].split(","), rows[-1].split(",")
    assert float(last[5]) <= float(first[5])


def test_read_dense_sharded_with_axes_perm(tmp_path, rng):
    """Permuted sharded-from-disk read: blocks match the dense
    load+reverse+canonicalize path, and no shard holds the full tensor."""
    from pairwise_perturbation_tpu.utils import io as ppio
    file_shape = (12, 6, 10, 3)
    arr = rng.standard_normal(file_shape)
    path = tmp_path / "v.bin"
    arr.astype("<f8").tofile(path)
    # CTF order = reversed file shape; canonical perm on top
    ctf_shape = tuple(reversed(file_shape))        # (3, 10, 6, 12)
    perm = (1, 2, 0, 3)                            # arbitrary non-identity
    final_shape = tuple(ctf_shape[p] for p in perm)
    nd = len(file_shape)
    axes = tuple(nd - 1 - perm[i] for i in range(nd))
    mesh = pmesh.make_mesh((8,), ("x",))
    layout = pmesh.plan_layout(final_shape, mesh)
    V = ppio.read_dense_sharded(str(path), layout, out_dtype=np.float64,
                                file_shape=file_shape, axes_perm=axes)
    want = arr.transpose(tuple(reversed(range(nd)))).transpose(perm)
    got = np.asarray(V)[tuple(slice(0, s) for s in final_shape)]
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # weak-scaling memory: every addressable shard is a strict subset
    full = int(np.prod(layout.padded_shape))
    for sh in V.addressable_shards:
        assert int(np.prod(sh.data.shape)) < full


def test_pp_sub_uses_constrained_caches(rng, monkeypatch):
    """With cfg.mesh_layout set, the host PP solver builds its caches via
    constrained_pp_caches and the pair caches carry the planned sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    shape = (6, 8, 8, 6)
    Ws_true = [rng.random((s, 3)) for s in shape]
    V = np.asarray(contract.build_dense([jnp.asarray(W) for W in Ws_true]))
    W0 = cp.init_factors(shape, 3, dtype=jnp.float64)
    mesh = pmesh.make_mesh((4, 2), ("x", "y"))
    layout = pmesh.plan_layout(shape, mesh)
    Vs = pmesh.shard_tensor(V, layout)
    Wss = pmesh.shard_factors(W0, layout)

    calls = []
    orig = pmesh.constrained_pp_caches

    def spy(V, Ws, lay):
        single, pair = orig(V, Ws, lay)
        calls.append((single, pair))
        return single, pair

    monkeypatch.setattr(pmesh, "constrained_pp_caches", spy)
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=0.1, maxiter=20, resprint=10,
                      mesh_layout=layout)
    res = cp.als_cp_pp(Vs, Wss, cfg)
    assert calls, "constrained_pp_caches never used by the solver"
    single, pair = calls[0]
    for (i, j), arr_c in pair.items():
        want = NamedSharding(mesh, P(None, layout.mode_axis.get(i),
                                     layout.mode_axis.get(j)))
        assert arr_c.sharding.is_equivalent_to(want, arr_c.ndim), (i, j)
    assert np.isfinite(res.diffV)


# ---------------------------------------------------------------------------
# Fused machines + cache builds: HLO collective assertions and pinned
# cache shardings (VERDICT r3 next #7/#8)
# ---------------------------------------------------------------------------


def _fused_sharded_setup(rng, shape=(6, 8, 8, 6), R=3):
    mesh = pmesh.make_mesh((4, 2), ("x", "y"))
    layout = pmesh.plan_layout(shape, mesh)
    Ws_true = [rng.random((s, R)) for s in shape]
    V = np.asarray(contract.build_dense([jnp.asarray(W) for W in Ws_true]))
    W0 = cp.init_factors(shape, R, dtype=jnp.float64)
    Vs = pmesh.shard_tensor(V, layout)
    Wss = pmesh.shard_factors(W0, layout)
    return mesh, layout, V, W0, Vs, Wss


def _fused_specs(layout, order):
    from jax.sharding import NamedSharding, PartitionSpec as P
    single_specs = tuple(
        NamedSharding(layout.mesh, P(layout.mode_axis.get(i), None))
        for i in range(order))
    pair_specs = tuple(
        NamedSharding(layout.mesh, P(None, layout.mode_axis.get(i),
                                     layout.mode_axis.get(j)))
        for (i, j) in cp._pair_keys(order))
    return single_specs, pair_specs


def test_fused_build_branch_pins_cache_shardings(rng):
    """After a sharded fused chunk passes through the build branch, the
    carry's pair caches must hold the PLANNED shardings (kept modes on
    their mesh axes, rank axis replicated) — not whatever GSPMD
    inference picked (VERDICT r3 weak #6)."""
    mesh, layout, V, W0, Vs, Wss = _fused_sharded_setup(rng)
    order = len(V.shape)
    single_specs, pair_specs = _fused_specs(layout, order)
    dtype = Wss[0].dtype
    lam = jnp.asarray(0.0, dtype)
    carry = cp.pp_fused_init(Vs, Wss, max_hist=16, n_slots=4)
    # tol_init huge -> the first DT sweep reads quiet -> build at body
    # step 2, PP sweeps after; chunk covers all three phases
    carry = cp.pp_fused_chunk(
        Vs, carry, lam, jnp.asarray(1.0, dtype), jnp.asarray(100.0, dtype),
        jnp.asarray(0.0, dtype), jnp.asarray(8), None,
        jnp.asarray(0.0, dtype), solver="svd", chunk=6, resprint=4,
        pp_cap=15, max_hist=16, n_slots=4,
        single_specs=single_specs, pair_specs=pair_specs)
    assert int(carry[0]) >= 3  # DT + >=2 PP sweeps ran (build consumed one)
    for spec, cache in zip(pair_specs, carry[8]):
        got = cache.sharding
        assert got.is_equivalent_to(spec, cache.ndim), (got, spec)
    for spec, cache in zip(single_specs, carry[7]):
        got = cache.sharding
        assert got.is_equivalent_to(spec, cache.ndim), (got, spec)


def test_fused_chunk_hlo_collectives_no_full_gather(rng):
    """The sharded fused machine must lower to collective reductions and
    must never all-gather the full V (the CTF-equivalent communication
    pattern, extended from the plain DT sweep to the fused machine)."""
    mesh, layout, V, W0, Vs, Wss = _fused_sharded_setup(rng)
    order = len(V.shape)
    single_specs, pair_specs = _fused_specs(layout, order)
    dtype = Wss[0].dtype
    lam = jnp.asarray(0.0, dtype)
    carry = cp.pp_fused_init(Vs, Wss, max_hist=16, n_slots=4)
    lowered = cp.pp_fused_chunk.lower(
        Vs, carry, lam, jnp.asarray(1.0, dtype), jnp.asarray(100.0, dtype),
        jnp.asarray(0.0, dtype), jnp.asarray(8), None,
        jnp.asarray(0.0, dtype), solver="svd", chunk=6, resprint=4,
        pp_cap=15, max_hist=16, n_slots=4,
        single_specs=single_specs, pair_specs=pair_specs)
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo or "reduce-scatter" in hlo
    full_v = f"f64[{','.join(str(s) for s in layout.padded_shape)}]"
    for line in hlo.splitlines():
        if "all-gather" in line and full_v in line:
            raise AssertionError(f"full V gathered: {line[:160]}")


def test_tucker_fused_hlo_collectives_no_full_gather(rng):
    from pairwise_perturbation_tpu.models import tucker
    mesh = pmesh.make_mesh((4, 2), ("x", "y"))
    shape, ranks = (6, 8, 8, 6), (2, 3, 3, 2)
    layout = pmesh.plan_layout(shape, mesh)
    V = rng.standard_normal(shape)
    Vs = pmesh.shard_tensor(V, layout)
    core0, Ws = tucker.hosvd(Vs, ranks)
    dtype = Ws[0].dtype
    carry = tucker.tucker_fused_init(Vs, Ws, ranks, max_hist=16,
                                     n_slots=4) \
        + (jnp.asarray(0.5, dtype),)
    lowered = tucker.tucker_fused_chunk.lower(
        Vs, carry, jnp.asarray(0.5, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(8), jnp.asarray(0.9, dtype), jnp.asarray(5e-3, dtype),
        ranks=ranks, subspace_iters=0, chunk=6, resprint=4, pp_cap=15,
        max_hist=16, n_slots=4)
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo or "reduce-scatter" in hlo
    full_v = f"f64[{','.join(str(s) for s in layout.padded_shape)}]"
    for line in hlo.splitlines():
        if "all-gather" in line and full_v in line:
            raise AssertionError(f"full V gathered: {line[:160]}")


def test_constrained_cache_build_hlo_no_full_gather(rng):
    """The sharded PP cache build itself (the memory-dominant object at
    scale, SURVEY 'hard parts') must not gather full V."""
    mesh, layout, V, W0, Vs, Wss = _fused_sharded_setup(
        rng, shape=(6, 8, 8, 6))
    from jax.sharding import NamedSharding, PartitionSpec as P
    order = V.ndim
    single_specs = tuple(
        NamedSharding(mesh, P(layout.mode_axis.get(i), None))
        for i in range(order))
    pair_specs = tuple(
        NamedSharding(mesh, P(None, layout.mode_axis.get(i),
                              layout.mode_axis.get(j)))
        for i in range(order) for j in range(i + 1, order))
    lowered = pmesh._constrained_build.lower(Vs, list(Wss), single_specs,
                                             pair_specs)
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo or "reduce-scatter" in hlo
    full_v = f"f64[{','.join(str(s) for s in layout.padded_shape)}]"
    for line in hlo.splitlines():
        if "all-gather" in line and full_v in line:
            raise AssertionError(f"full V gathered: {line[:160]}")


def test_tucker_fused_sharded_matches_unsharded(rng):
    """Tucker fused machine with cfg.mesh_layout (pinned TTMc cache
    shardings) reproduces the unsharded fit."""
    from pairwise_perturbation_tpu.models import tucker
    shape, ranks = (8, 8, 6, 6), (3, 3, 2, 2)
    core = rng.standard_normal(ranks)
    Wt = [np.linalg.qr(rng.standard_normal((s, r)))[0]
          for s, r in zip(shape, ranks)]
    V = np.einsum("PQRS,aP,bQ,cR,dS->abcd", core, *Wt)
    cfg = tucker.TuckerConfig(tol=0.0, pp_res_tol=0.5, maxiter=15,
                              resprint=5, subspace_iters=0)
    res_plain = tucker.als_tucker_pp_fused(V, ranks, cfg, chunk=8)
    mesh = pmesh.make_mesh((4, 2), ("x", "y"))
    layout = pmesh.plan_layout(shape, mesh)
    Vs = pmesh.shard_tensor(V, layout)
    import dataclasses
    cfg_s = dataclasses.replace(cfg, mesh_layout=layout)
    res_shard = tucker.als_tucker_pp_fused(Vs, ranks, cfg_s, chunk=8)
    # the fixture has exact Tucker rank, so both runs land at the
    # rounding floor — compare with an absolute floor tolerance
    np.testing.assert_allclose(res_shard.diffV, res_plain.diffV,
                               rtol=1e-6, atol=1e-6)
