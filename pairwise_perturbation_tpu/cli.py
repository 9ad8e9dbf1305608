"""Command-line drivers — TPU-native equivalents of the reference binaries.

- ``python -m pairwise_perturbation_tpu.cli test_als ...``  <-> ``./test_ALS``
  (test_ALS.cxx: legacy engine, CP {DT, PP, PP-partupdate} and Tucker {DT, PP})
- ``python -m pairwise_perturbation_tpu.cli run ...``       <-> ``./run``
  (run.cxx: second-gen CPD with {DT, MSDT, DT-LR, MSDT-LR, Simple})
- ``python -m pairwise_perturbation_tpu.cli pp_bench ...``  <-> ``./pp_bench``
  (pp_bench.cxx: per-sweep [DTtime]/[PPfirst]/[PPsecond] timing)

Flags follow the reference surface (utils/flags.py). Example:

    python -m pairwise_perturbation_tpu.cli test_als -model CP -tensor r \\
        -pp 1 -dim 4 -size 24 -rank 8 -maxiter 100 -filename out.csv
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _np_dtype(name: str):
    """Factor-matrix dtype. ``bfloat16`` selects the *mixed-precision*
    mode: V is stored bf16 (halved HBM traffic, native bf16 MXU with f32
    accumulation in every contraction touching V) while factors, Gram
    matrices and solves stay f32 — see contract._einsum."""
    import jax.numpy as jnp
    return {"float32": jnp.float32, "float64": jnp.float64,
            "bfloat16": jnp.float32}[name]


def _v_dtype(name: str):
    """Dtype V is stored in on device."""
    import jax.numpy as jnp
    return {"float32": jnp.float32, "float64": jnp.float64,
            "bfloat16": jnp.bfloat16}[name]


def _load_tensor(args):
    """Load/construct the tensor and canonicalize its mode order for TPU
    tile layouts (utils.layout): e.g. time-lapse (33,1344,1024,9) would
    occupy 23.3 GB with its 9-sized minor mode lane-padded to 128; the
    permuted layout costs 1.63 GB. Returns (V, perm); per-mode outputs
    must be mapped back with layout.unpermute_factors."""
    from pairwise_perturbation_tpu.utils import io as ppio, synth
    name = args.tensor
    dt = np.float64 if args.dtype == "float64" else np.float32
    if name == "o1":
        V = ppio.load_coil100(args.tensorfile if args.tensorfile != "test"
                              else "coil-100.bin", out_dtype=dt)
    elif name == "o2":
        V = ppio.load_time_lapse(args.tensorfile if args.tensorfile != "test"
                                 else "time-lapse.bin", out_dtype=dt)
    else:
        V = synth.make_tensor(name, args.dim, args.size, args.rank,
                              args.colmin, args.colmax, args.rationoise,
                              seed=args.seed, dtype=dt)
    from pairwise_perturbation_tpu.utils import layout
    V, perm = layout.canonicalize(V)
    if perm != tuple(range(V.ndim)) and not args.quiet:
        print(f"  canonicalized mode order for TPU tiling: perm={perm}")
    return V, perm


def _maybe_shard(V, Ws, args):
    if not args.mesh:
        return V, Ws, None
    import jax
    from pairwise_perturbation_tpu.parallel import mesh as pmesh
    shape = tuple(int(x) for x in args.mesh.split("x"))
    mesh = pmesh.make_mesh(shape)
    layout = pmesh.plan_layout(V.shape, mesh)
    Vs = pmesh.shard_tensor(V, layout)
    Wss = pmesh.shard_factors(Ws, layout)
    return Vs, Wss, layout


def _print_banner(args):
    if args.quiet:
        return
    print(f"  model=  {args.model}  tensor=  {args.tensor}  pp=  {args.pp}")
    print(f"  dim=  {args.dim}  size=  {args.size}  rank=  {args.rank}")
    print(f"  tolerance=  {args.tol}  restarttol=  {args.pp_res_tol}")
    print(f"  lambda=  {args.lam}  magnitude=  {args.magni}"
          f"  filename=  {args.filename}")
    print(f"  timelimit=  {args.timelimit}  maxiter=  {args.maxiter}"
          f"  resprint=  {args.resprint}")
    print(f"  dtype=  {args.dtype}  mesh=  {args.mesh or '1'}")


def _tucker_ranks(args, V):
    if args.tensor == "o1":
        return (3, 10, 10, 70)          # test_ALS.cxx:368-373
    if args.tensor == "o2":
        return (10, 100, 100, 5)        # test_ALS.cxx:375-380
    return tuple([args.rank] * V.ndim)


def cmd_test_als(args) -> int:
    import jax.numpy as jnp
    from pairwise_perturbation_tpu.models import cp, tucker
    from pairwise_perturbation_tpu.utils.metrics import PlotFile
    import jax

    from pairwise_perturbation_tpu.utils import layout as tlayout
    _print_banner(args)
    V, perm = _load_tensor(args)
    Vnorm = float(np.linalg.norm(V.ravel()))
    if not args.quiet:
        print(f"Vnorm= {Vnorm}")
    if args.dtype == "bfloat16":
        V = jnp.asarray(V, dtype=_v_dtype(args.dtype))
    t0 = time.perf_counter()

    if args.model == "CP":
        if args.resume:
            from pairwise_perturbation_tpu.utils import io as ppio
            ck = ppio.load_checkpoint(args.resume)
            Ws = [jnp.asarray(ck["factors"][m], dtype=_np_dtype(args.dtype))
                  for m in perm]
            if not args.quiet:
                print(f"resumed {len(Ws)} factors from {args.resume} "
                      f"(iteration {ck['iteration']})")
        else:
            Ws = cp.init_factors(V.shape, args.rank,
                                 key=jax.random.PRNGKey(args.seed),
                                 dtype=_np_dtype(args.dtype))
        Vd, Ws, layout = _maybe_shard(V, Ws, args)
        cfg = cp.CPConfig(tol=args.tol * Vnorm, pp_res_tol=args.pp_res_tol,
                          lam=args.lam, ratio_step=args.magni,
                          maxiter=args.maxiter, timelimit=args.timelimit,
                          resprint=args.resprint,
                          update_percentage=args.update_percentage_pp,
                          precompute_layouts=bool(args.layouts))
        plot = PlotFile(args.filename, PlotFile.CP_HEADER, echo=not args.quiet)
        if args.pp == 0:
            res = cp.als_cp_dt(Vd, Ws, cfg, plot)
        elif args.pp == 1:
            if args.device_loop:
                res = cp.als_cp_pp_device(Vd, Ws, cfg, plot)
            else:
                res = cp.als_cp_pp(Vd, Ws, cfg, plot)
        else:
            res = cp.als_cp_pp(Vd, Ws, cfg, plot, partial_update=True)
        plot.close()
        if args.checkpoint:
            from pairwise_perturbation_tpu.utils import io as ppio
            ppio.save_checkpoint(
                args.checkpoint,
                tlayout.unpermute_factors(res.factors, perm), res.iters,
                meta=dict(model="CP", tensor=args.tensor))
        if not args.quiet:
            print(f"\nIter = {res.iters} Final grad norm {res.gradnorm:E}")
    else:
        ranks = tlayout.permute_tuple(_tucker_ranks(args, V), perm)
        cfg = tucker.TuckerConfig(tol=args.tol * Vnorm,
                                  pp_res_tol=args.pp_res_tol,
                                  maxiter=args.maxiter,
                                  timelimit=args.timelimit,
                                  resprint=args.resprint,
                                  subspace_iters=args.tucker_subspace)
        plot = PlotFile(args.filename, PlotFile.TUCKER_HEADER,
                        echo=not args.quiet)
        if args.pp == 0:
            res = tucker.als_tucker(V, ranks, cfg, plot)
        else:
            if args.device_loop:
                res = tucker.als_tucker_pp_device(V, ranks, cfg, plot)
            else:
                res = tucker.als_tucker_pp(V, ranks, cfg, plot)
        plot.close()
        if args.checkpoint:
            from pairwise_perturbation_tpu.utils import io as ppio
            ppio.save_checkpoint(
                args.checkpoint,
                tlayout.unpermute_factors(res.factors, perm), res.iters,
                core=tlayout.unpermute_core(res.core, perm),
                meta=dict(model="Tucker", tensor=args.tensor))
        if not args.quiet:
            print(f"\nIter = {res.iters} Final Diff norm {res.diffnorm:E}")
    if not args.quiet:
        print(f"experiment took {time.perf_counter() - t0:.6f} seconds")
    return 0


def cmd_run(args) -> int:
    import jax
    import jax.numpy as jnp
    from pairwise_perturbation_tpu.models import cp, optimizers as opt
    from pairwise_perturbation_tpu.utils.metrics import PlotFile

    _print_banner(args)
    V, perm = _load_tensor(args)
    Vnorm = float(np.linalg.norm(V.ravel()))
    order = V.ndim
    Ws = cp.init_factors(V.shape, args.rank,
                         key=jax.random.PRNGKey(args.seed),
                         dtype=_np_dtype(args.dtype))
    make = {
        0: lambda: opt.CPDTOptimizer(order, args.rank),
        1: lambda: opt.CPMSDTOptimizer(
            order, args.rank, min_holdout_size=args.msdt_min_holdout),
        2: lambda: opt.CPDTLROptimizer(order, args.rank, args.updaterank,
                                       bool(args.randomsvd)),
        3: lambda: opt.CPMSDTLROptimizer(
            order, args.rank, args.updaterank, bool(args.randomsvd),
            min_holdout_size=args.msdt_min_holdout),
        4: lambda: opt.CPSimpleOptimizer(order, args.rank),
    }[args.pp]
    model = opt.CPD(order, list(V.shape), args.rank, make())
    model.init(jnp.asarray(V, dtype=_v_dtype(args.dtype)), Ws, lam=args.lam)
    plot = PlotFile(args.filename, PlotFile.CP_HEADER, echo=not args.quiet)
    model.als(tol=args.tol * Vnorm, timelimit=args.timelimit,
              maxsweep=args.maxiter, resprint=args.resprint, plot=plot,
              macro=bool(args.device_loop))
    plot.close()
    if not args.quiet:
        print(f"\nFinal gradnorm {model.gradnorm:E}")
    return 0


def cmd_pp_bench(args) -> int:
    """Per-sweep timing: [DTtime] rows from 1-sweep DT runs, then
    [PPfirst]/[PPsecond] from 1-sweep PP runs, all from identical factors
    (pp_bench.cxx:277-348)."""
    import jax
    import jax.numpy as jnp
    from pairwise_perturbation_tpu.models import cp, tucker
    from pairwise_perturbation_tpu.utils.metrics import PlotFile

    from pairwise_perturbation_tpu.utils import layout as tlayout
    _print_banner(args)
    V, perm = _load_tensor(args)
    V = jnp.asarray(V, dtype=_v_dtype(args.dtype))
    Vnorm = float(jnp.linalg.norm(V.ravel()))
    plot = PlotFile(args.filename, PlotFile.BENCH_HEADER, echo=not args.quiet)

    if args.model == "CP":
        W0 = cp.init_factors(V.shape, args.rank,
                             key=jax.random.PRNGKey(args.seed),
                             dtype=_np_dtype(args.dtype))
        lam = jnp.asarray(args.lam, dtype=V.dtype)
        # warm up compiles (excluded, like CTF's first-touch costs are not)
        Ws, _ = cp.dt_sweep(V, [jnp.array(w) for w in W0], lam,
                            solver="svd")
        jax.block_until_ready(Ws)
        for _ in range(args.maxiter):
            Ws = [jnp.array(w) for w in W0]
            t0 = time.perf_counter()
            Ws, _ = cp.dt_sweep(V, Ws, lam, solver="svd")
            jax.block_until_ready(Ws)
            plot.bench_row("DTtime", time.perf_counter() - t0)
        # PP: cache build + first sweep, then steady-state sweep
        single, pair = cp.pp_build_caches(V, [jnp.array(w) for w in W0])
        jax.block_until_ready(single)
        for _ in range(args.maxiter):
            Ws = [jnp.array(w) for w in W0]
            t0 = time.perf_counter()
            single, pair = cp.pp_build_caches(V, Ws)
            W_init = [w for w in Ws]
            dWs = [jnp.zeros_like(w) for w in Ws]
            Ws, dWs, _ = cp.pp_sweep(single, pair, Ws, W_init, dWs, lam,
                                     args.magni, solver="svd")
            jax.block_until_ready(Ws)
            t1 = time.perf_counter()
            plot.bench_row("PPfirst", t1 - t0)
            Ws2, dWs2, _ = cp.pp_sweep(single, pair, Ws, W_init, dWs, lam,
                                       args.magni, solver="svd")
            jax.block_until_ready(Ws2)
            plot.bench_row("PPsecond", time.perf_counter() - t1)
    else:
        ranks = tlayout.permute_tuple(_tucker_ranks(args, V), perm)
        core, Ws0 = tucker.hosvd(V, ranks)
        jax.block_until_ready(core)
        Ws, _ = tucker.tucker_dt_sweep(V, Ws0, Ws0, ranks=tuple(ranks),
                                       use_sign=True)
        jax.block_until_ready(Ws)
        for _ in range(args.maxiter):
            t0 = time.perf_counter()
            Ws, _ = tucker.tucker_dt_sweep(V, list(Ws0), Ws0,
                                           ranks=tuple(ranks), use_sign=True)
            jax.block_until_ready(Ws)
            plot.bench_row("DTtime", time.perf_counter() - t0)
        single, pair = tucker.tucker_build_caches(V, list(Ws0))
        jax.block_until_ready(single)
        for _ in range(args.maxiter):
            t0 = time.perf_counter()
            single, pair = tucker.tucker_build_caches(V, list(Ws0))
            W_init = [w for w in Ws0]
            dWs = [jnp.zeros_like(w) for w in Ws0]
            Ws, dWs, core = tucker.tucker_pp_sweep(single, pair, list(Ws0),
                                                   W_init, dWs,
                                                   ranks=tuple(ranks))
            jax.block_until_ready(Ws)
            t1 = time.perf_counter()
            plot.bench_row("PPfirst", t1 - t0)
            Ws2, dWs2, core2 = tucker.tucker_pp_sweep(single, pair, Ws,
                                                      W_init, dWs,
                                                      ranks=tuple(ranks))
            jax.block_until_ready(Ws2)
            plot.bench_row("PPsecond", time.perf_counter() - t1)
    plot.close()
    return 0


def main(argv=None) -> int:
    from pairwise_perturbation_tpu.utils import flags
    argv = list(sys.argv[1:] if argv is None else argv)
    cmd = "test_als"
    if argv and argv[0] in ("test_als", "run", "pp_bench"):
        cmd = argv.pop(0)
    parser = flags.build_parser(f"pairwise_perturbation_tpu.cli {cmd}")
    args = parser.parse_args(argv)
    flags.clamp(args)
    if args.issparse:
        # The reference forwards -issparse into CTF sparse tensors
        # (test_ALS.cxx); this framework is dense-only by design — fail
        # loudly rather than silently ignoring the flag.
        raise SystemExit(
            "-issparse 1 is not supported: the TPU-native framework is "
            "dense-only (sparse CTF tensors have no XLA equivalent here). "
            "Re-run without -issparse.")
    # Multi-host SPMD bring-up: no-op single-host, loud on a failed
    # coordinator handshake (parallel/mesh.py:distributed_init).
    from pairwise_perturbation_tpu.parallel import mesh as pmesh
    pmesh.distributed_init()
    if args.profile:
        from pairwise_perturbation_tpu.utils import tracing
        tracing.enable()
    tracing_device = bool(args.profile and args.trace_dir)
    if tracing_device:
        # device-level trace (the CTF Timer_epoch analogue at XLA op
        # granularity); view with xprof / tensorboard
        import jax
        jax.profiler.start_trace(args.trace_dir)
    try:
        rc = {"test_als": cmd_test_als, "run": cmd_run,
              "pp_bench": cmd_pp_bench}[cmd](args)
    finally:
        if tracing_device:
            import jax
            jax.profiler.stop_trace()
            if not args.quiet:
                print(f"device trace written to {args.trace_dir}")
    if args.profile:
        from pairwise_perturbation_tpu.utils import tracing
        print("\n" + tracing.report())
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
