"""Fused order-3 MTTKRP Pallas kernel.

M[i, r] = sum_{j,k} V[i,j,k] B[j,r] C[k,r]

The XLA chain (V x C -> (I,J,R) intermediate -> x B) writes and re-reads an
intermediate R/K times the size of V's per-(i,j) fiber; this kernel keeps
the accumulator in VMEM and reads V exactly once from HBM:

    for each grid step (i_tile, j):
        G = V[i_tile, j, :] @ C            # MXU: (TI, K) @ (K, R)
        acc[i_tile] += G * B[j, :]          # VPU broadcast multiply

Order-3 is the reference's minimum-slice benchmark configuration
(BASELINE.json config 1: dim 200^3 rank 10) and the folded Poisson 'p'
fixture; higher-order MTTKRPs bottom out in these order-3 chains after
dimension-tree contraction of the other modes.

Grid iteration: j is the innermost grid dimension, so the output block
(indexed only by i_tile) stays resident in VMEM across the j-reduction —
the standard Pallas accumulation pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; interpret mode works without them
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


# In-kernel dot precision: on TPU a DEFAULT-precision dot on f32 inputs
# runs ONE bf16 MXU pass (~2.5e-3 rel error — measured vs the framework's
# HIGHEST-precision XLA convention); these kernels are HBM-bound, so the
# extra MXU passes of HIGHEST are free. bf16 inputs take the native bf16
# path regardless.
def _dot_prec(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _kernel(v_ref, b_ref, c_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v, b, c = v_ref[:], b_ref[:], c_ref[:]   # v: (TI, JB, K)
    if v.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        # CPU (interpret/tests) lacks a bf16 dot kernel; bf16 products are
        # exact in f32, so upcasting is numerically equivalent.
        v, b, c = (x.astype(jnp.float32) for x in (v, b, c))
    ti, jb, k = v.shape
    g = jnp.dot(v.reshape(ti * jb, k), c,
                preferred_element_type=jnp.float32,
                precision=_dot_prec(v.dtype))             # (TI*JB, R)
    # the KR weight multiplies the f32 GEMM result — broadcast in f32
    # (a bf16 (JB, R) -> (1, JB, R) shape cast is unsupported in Mosaic)
    g = g.reshape(ti, jb, -1) * b.astype(jnp.float32)[None, :, :]
    out_ref[:] += jnp.sum(g, axis=1).astype(out_ref.dtype)


def _align_tile(t: int, min_sub: int) -> int:
    """Round a tile size down to the sublane multiple (floor at min_sub).

    Every tile that lands on a block's sublane dimension must be a
    multiple of 8 (f32) / 16 (bf16); callers zero-pad the array dimension
    up to a tile multiple, so flooring here never loses coverage."""
    return max(min_sub, t // min_sub * min_sub)


def _mttkrp3_tiles(I: int, J: int, K: int, itemsize: int = 4,
                   min_sub: int = 8):
    """Auto tile selection, from a v5e sweep (scripts/bench_mttkrp3.py):
    ~2 MiB V blocks with the widest J tile that divides J (wider tile_j =
    larger GEMM M per step). Best measured: 512^3 -> (32, 32) at 0.33 ms
    (2.6x XLA); 200^3 -> (200, 8) at 0.08 ms (11x XLA). bf16 blocks need
    16-row sublane tiles (min_sub=16)."""
    if J % 32 == 0:
        tile_j = 32
    elif J % 16 == 0 or min_sub > 8:
        tile_j = 16  # non-divisible J is zero-padded by the caller
    else:
        tile_j = 8
    tile_i = max(min_sub,
                 min(I, (2 << 20) // (tile_j * K * itemsize)
                     // min_sub * min_sub))
    return tile_i, tile_j


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def mttkrp3(V, B, C, tile_i: int = None, tile_j: int = None,
            interpret: bool = False):
    """Fused MTTKRP for the first mode of an order-3 tensor.

    V: (I, J, K); B: (J, R); C: (K, R) -> M: (I, R).
    For other modes, transpose V first (cheap relative to the contraction).
    ``tile_j`` must satisfy TPU sublane tiling (multiple of 8 for f32).
    """
    I, J, K = V.shape
    R = B.shape[1]
    bf16 = V.dtype == jnp.bfloat16
    out_dtype = jnp.float32 if bf16 else V.dtype
    if bf16:
        B = B.astype(jnp.bfloat16)
        C = C.astype(jnp.bfloat16)
    min_sub = 16 if bf16 else 8
    auto_i, auto_j = _mttkrp3_tiles(I, J, K, itemsize=2 if bf16 else 4,
                                    min_sub=min_sub)
    # tile_i lands on the output block's sublane dim, tile_j on the V
    # block's: both must be sublane multiples (ragged I like 13 would
    # otherwise put a non-multiple-of-8/16 size on a sublane dim).
    tile_i = _align_tile(min(tile_i or auto_i, I), min_sub)
    tile_j = _align_tile(min(tile_j or auto_j, J), min_sub)
    # zero-pad J to a tile multiple: input-block padding contents are
    # unspecified in Pallas, and zero rows contribute nothing to the sum.
    if J % tile_j != 0:
        Jp = ((J + tile_j - 1) // tile_j) * tile_j
        V = jnp.pad(V, ((0, 0), (0, Jp - J), (0, 0)))
        B = jnp.pad(B, ((0, Jp - J), (0, 0)))
        J = Jp
    grid = (pl.cdiv(I, tile_i), J // tile_j)

    def vmem(spec_args, index_map):
        if _VMEM is not None and not interpret:
            return pl.BlockSpec(spec_args, index_map, memory_space=_VMEM)
        return pl.BlockSpec(spec_args, index_map)

    in_specs = [
        vmem((tile_i, tile_j, K), lambda i, j: (i, j, 0)),
        vmem((tile_j, R), lambda i, j: (j, 0)),
        vmem((K, R), lambda i, j: (0, 0)),
    ]
    out_specs = vmem((tile_i, R), lambda i, j: (i, 0))

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((I, R), out_dtype),
        interpret=interpret,
    )(V, B, C)


def _kernel_m1(v_ref, a_ref, c_ref, out_ref):
    # out[j, r] = sum_{i,k} V[i,j,k] A[i,r] C[k,r]; grid (j_tile, i_step)
    # with i innermost, so the (TJ, R) output block accumulates in VMEM.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v, a, c = v_ref[:], a_ref[:], c_ref[:]   # v: (TI, TJ, K)
    if v.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        v, a, c = (x.astype(jnp.float32) for x in (v, a, c))
    ti, tj, k = v.shape
    g = jnp.dot(v.reshape(ti * tj, k), c,
                preferred_element_type=jnp.float32,
                precision=_dot_prec(v.dtype))             # (TI*TJ, R)
    g = g.reshape(ti, tj, -1) * a.astype(jnp.float32)[:, None, :]
    out_ref[:] += jnp.sum(g, axis=0).astype(out_ref.dtype)


def _kernel_m2(v_ref, a_ref, b_ref, out_ref):
    # out[k, r] = sum_{i,j} V[i,j,k] A[i,r] B[j,r]; the full (K, R) output
    # block is resident across the whole (i, j) reduction grid.
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v, a, b = v_ref[:], a_ref[:], b_ref[:]   # v: (TI, TJ, K)
    if v.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        v, a, b = (x.astype(jnp.float32) for x in (v, a, b))
    ti, tj, k = v.shape
    # The KR weight must be a GEMM operand here (unlike modes 0/1, where
    # the second factor multiplies the f32 GEMM result), so in bf16 it
    # incurs exactly one rounding: bf16 products are exact in f32, so the
    # weight is formed in f32 and cast once to the MXU input dtype.
    w = (a.astype(jnp.float32)[:, None, :]
         * b.astype(jnp.float32)[None, :, :]) \
        .astype(v.dtype).reshape(ti * tj, -1)                # KR weights
    g = jax.lax.dot_general(v.reshape(ti * tj, k), w,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_dot_prec(v.dtype))    # (K, R)
    out_ref[:] += g.astype(out_ref.dtype)


def _pad_rows(X, n: int):
    return X if X.shape[0] == n else jnp.pad(
        X, ((0, n - X.shape[0]),) + ((0, 0),) * (X.ndim - 1))


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def mttkrp3_m1(V, A, C, tile_i: int = None, tile_j: int = None,
               interpret: bool = False):
    """Fused MTTKRP for the MIDDLE mode of an order-3 tensor, reading V in
    its native layout (no transposed copy): M[j, r] = sum V[i,j,k] A C."""
    I, J, K = V.shape
    R = A.shape[1]
    bf16 = V.dtype == jnp.bfloat16
    out_dtype = jnp.float32 if bf16 else V.dtype
    if bf16:
        A = A.astype(jnp.bfloat16)
        C = C.astype(jnp.bfloat16)
    min_sub = 16 if bf16 else 8
    auto_i, auto_j = _mttkrp3_tiles(I, J, K, itemsize=2 if bf16 else 4,
                                    min_sub=min_sub)
    # the i tile is the reduction step here and the j tile the output rows;
    # the same ~2 MiB block budget applies with the roles swapped. Both
    # tiles land on sublane dims (V block: tile_j; A block: tile_i; output
    # block: tile_j), so both are aligned to the sublane multiple — the
    # swapped auto_i was clamped by min(I, ...) and could be ragged.
    tile_i = _align_tile(min(tile_i or auto_j, I), min_sub)
    tile_j = _align_tile(min(tile_j or auto_i, J), min_sub)
    Ip = ((I + tile_i - 1) // tile_i) * tile_i
    Jp = ((J + tile_j - 1) // tile_j) * tile_j
    if Ip != I or Jp != J:  # zero rows contribute nothing to the sum
        V = jnp.pad(V, ((0, Ip - I), (0, Jp - J), (0, 0)))
        A = _pad_rows(A, Ip)

    def vmem(spec_args, index_map):
        if _VMEM is not None and not interpret:
            return pl.BlockSpec(spec_args, index_map, memory_space=_VMEM)
        return pl.BlockSpec(spec_args, index_map)

    out = pl.pallas_call(
        _kernel_m1,
        grid=(Jp // tile_j, Ip // tile_i),
        in_specs=[
            vmem((tile_i, tile_j, K), lambda j, i: (i, j, 0)),
            vmem((tile_i, R), lambda j, i: (i, 0)),
            vmem((K, R), lambda j, i: (0, 0)),
        ],
        out_specs=vmem((tile_j, R), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((Jp, R), out_dtype),
        interpret=interpret,
    )(V, A, C)
    return out[:J] if Jp != J else out


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def mttkrp3_m2(V, A, B, tile_i: int = None, tile_j: int = None,
               interpret: bool = False):
    """Fused MTTKRP for the MINOR mode of an order-3 tensor, reading V in
    its native layout: M[k, r] = sum_{i,j} V[i,j,k] A[i,r] B[j,r] — per
    block a (K x TI*TJ) @ (TI*TJ x R) GEMM against the on-the-fly
    Khatri-Rao weight block, accumulated into a resident (K, R) output."""
    I, J, K = V.shape
    R = A.shape[1]
    bf16 = V.dtype == jnp.bfloat16
    out_dtype = jnp.float32 if bf16 else V.dtype
    if bf16:
        A = A.astype(jnp.bfloat16)
        B = B.astype(jnp.bfloat16)
    min_sub = 16 if bf16 else 8
    auto_i, auto_j = _mttkrp3_tiles(I, J, K, itemsize=2 if bf16 else 4,
                                    min_sub=min_sub)
    # both tiles land on sublane dims (V block: tile_j; A: tile_i; B:
    # tile_j) — align both (see mttkrp3_m1).
    tile_i = _align_tile(min(tile_i or auto_j, I), min_sub)
    tile_j = _align_tile(min(tile_j or auto_i, J), min_sub)
    Ip = ((I + tile_i - 1) // tile_i) * tile_i
    Jp = ((J + tile_j - 1) // tile_j) * tile_j
    if Ip != I or Jp != J:
        V = jnp.pad(V, ((0, Ip - I), (0, Jp - J), (0, 0)))
        A = _pad_rows(A, Ip)
        B = _pad_rows(B, Jp)

    def vmem(spec_args, index_map):
        if _VMEM is not None and not interpret:
            return pl.BlockSpec(spec_args, index_map, memory_space=_VMEM)
        return pl.BlockSpec(spec_args, index_map)

    return pl.pallas_call(
        _kernel_m2,
        grid=(Ip // tile_i, Jp // tile_j),
        in_specs=[
            vmem((tile_i, tile_j, K), lambda i, j: (i, j, 0)),
            vmem((tile_i, R), lambda i, j: (i, 0)),
            vmem((tile_j, R), lambda i, j: (j, 0)),
        ],
        out_specs=vmem((K, R), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, R), out_dtype),
        interpret=interpret,
    )(V, A, B)


# mttkrp3_m2 keeps the full (K, R) f32 accumulator resident in VMEM for
# the whole grid alongside the ~2 MiB V block; bound it so the resident
# set stays well inside the ~128 MiB v5e VMEM.
_M2_RESIDENT_BYTES = 8 << 20


def mttkrp3_mode(V, factors, mode: int, tile_i: int = None,
                 interpret: bool = False):
    """Fused order-3 MTTKRP for any mode in ONE pass over V's native
    layout. Mode-specialized kernels replace the transposed-copy fallback
    (a full extra HBM read+write of V per non-leading mode, which made the
    Pallas path slower than XLA at 512^3 — see NOTES_ROUND1.md)."""
    if mode == 0:
        return mttkrp3(V, factors[1], factors[2], tile_i=tile_i,
                       interpret=interpret)
    if mode == 1:
        return mttkrp3_m1(V, factors[0], factors[2], tile_i=tile_i,
                          interpret=interpret)
    K, R = V.shape[2], factors[0].shape[1]
    if K * R * 4 > _M2_RESIDENT_BYTES:
        # resident (K, R) output would not fit VMEM: fall back to the
        # transposed-copy path (one extra HBM pass, but tiled output).
        return mttkrp3(jnp.moveaxis(V, 2, 0), factors[0], factors[1],
                       tile_i=tile_i, interpret=interpret)
    return mttkrp3_m2(V, factors[0], factors[1], tile_i=tile_i,
                      interpret=interpret)


# ---------------------------------------------------------------------------
# First-level (non-minor mode) contraction kernel
# ---------------------------------------------------------------------------
#
# Every dimension-tree / PP-cache chain starts with a first-level
# contraction V x_m W_m (the chain roots of Build_mttkrp_map,
# als_CP.cxx:352-409, and mttkrp_map_init, cp_msdt_optimizer.cxx:111-144):
#
#     C[pre..., post..., r] = sum_b V[pre..., b, post...] W[b, r]
#
# Row-major V reshapes for free to (P, B, M) around mode m (P = flattened
# leading modes, M = flattened trailing modes), so one kernel serves every
# tensor order and every non-minor mode. Each block holds *complete*
# contraction fibers — (1, B, L) with L a lane tile of M — so the GEMM has
# the full-size K = B and the kernel is a single HBM pass over V.
#
# MEASURED VERDICT (v5e, coil-100 shape; see NOTES_ROUND1.md): the raw
# kernel hits the HBM bandwidth bound (1.35 ms vs 2.6 ms XLA f32), but its
# natural output layout is rank-major (R, L) and every way of exposing the
# rank-last convention loses more than the kernel gains: a post-hoc XLA
# transpose costs ~12 ms (cannot fuse across the pallas_call custom-call
# boundary), and an in-kernel (R, L) -> (L, R) relayout costs ~10 us/step
# (~13 ms total). XLA's einsum handles the same layout problem inside its
# GEMM at ~0.85 of the bandwidth bound, and bf16-stored V doubles that
# again — so production routing (config.use_pallas_first) stays OFF and
# the mixed-precision XLA path is the production fast path. Kept for
# rank-major consumers and future Mosaic layout improvements.
#
# The last mode (m = order-1) is already a plain (P*B-by-B) @ (B, R)
# minor-dim GEMM that XLA executes at speed of light — no kernel needed.


def _mid_kernel(wt_ref, v_ref, o_ref):
    # wt (R, B) @ v (B, L) -> (R, L): both operands are in the MXU's
    # native (M, K) x (K, N) orientation — the V block streams from HBM
    # straight into the MXU with no VMEM relayout.
    g = jax.lax.dot_general(wt_ref[:], v_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_dot_prec(v_ref.dtype))
    o_ref[0] = g.astype(o_ref.dtype)               # (R, L)


def _mid_kernel_zp(wt_ref, v_ref, o_ref):
    # (R, B) @ (B, L) -> (R, L), written into a rank-MAJOR output array
    # (R, P, M): block (R, 1, L). Rank major-most is XLA's preferred
    # batch-dim position for the consuming dots, so downstream tail
    # contractions read it with no relayout.
    g = jax.lax.dot_general(wt_ref[:], v_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_dot_prec(v_ref.dtype))
    o_ref[:, 0, :] = g.astype(o_ref.dtype)


def _mid_kernel_t(wt_ref, v_ref, o_ref):
    # Same GEMM, but the small (R, L) result is transposed in-VMEM per
    # step so the HBM output is rank-minor directly. XLA cannot fold a
    # transpose of a pallas_call output into a consumer (custom-call
    # layout barrier), so a 110 MB post-hoc transpose costs ~12 ms; this
    # per-step ~128 KB relayout replaces it.
    g = jax.lax.dot_general(wt_ref[:], v_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_dot_prec(v_ref.dtype))
    o_ref[0] = g.T.astype(o_ref.dtype)             # (L, R)


def _mid_tile(B: int, M: int) -> int:
    """Lane tile of the merged trailing dim, or 0 if no good tiling exists.

    Measured on v5e: ragged (out-of-bounds padded) lane tiles cost ~20 us
    each in Mosaic — enough to erase the kernel's advantage — so the tile
    must divide M exactly. A full-M block (no grid tiling of M) is best
    when it fits VMEM; otherwise ~1 MiB blocks hit the HBM bandwidth bound
    (L=2048 at B=128 measured at ~880 GB/s, XLA's einsum ~2x slower).
    """
    if M < (1 << 15):
        # small merged trailing dims (and full-M single blocks) measured
        # SLOWER than XLA's einsum on v5e — only the long-M tiled form
        # reaches the bandwidth bound.
        return 0
    for L in (2048, 1024, 512, 256, 128):
        if B * L * 4 <= (2 << 20) and M % L == 0:
            return L
    return 0


def mid_contract_eligible(shape, mode: int, dtype, r: int) -> bool:
    """Whether :func:`mid_contract` applies to mode ``mode`` of ``shape``."""
    if dtype not in (jnp.float32, jnp.bfloat16) \
            or not (0 <= mode < len(shape) - 1):
        return False
    if r > 256:
        return False
    B = shape[mode]
    M = 1
    for s in shape[mode + 1:]:
        M *= s
    if B < 8 or B > 4096 or B % 8 != 0:
        return False
    return M >= 128 and _mid_tile(B, M) > 0


@functools.partial(jax.jit, static_argnames=("mode", "interpret",
                                             "rank_minor"))
def mid_contract(V, W, mode: int, interpret: bool = False,
                 rank_minor: bool = True):
    """First-level contraction V x_mode W in one HBM pass.

    Returns a tensor with axes (all modes except ``mode``, ascending) + rank
    — the :func:`...ops.contract.contract_mode_kr` convention. A ragged
    last lane tile reads unspecified padding, which only lands in output
    rows beyond M and is sliced off (the trailing index is never
    contracted).
    """
    shape = V.shape
    order = V.ndim
    R = W.shape[1]
    P = 1
    for s in shape[:mode]:
        P *= s
    B = shape[mode]
    M = 1
    for s in shape[mode + 1:]:
        M *= s
    V3 = V.reshape(P, B, M)
    L = _mid_tile(B, M) or M  # direct/interpret calls on ineligible shapes
    nl = pl.cdiv(M, L)
    Mp = nl * L
    # bf16-stored V: native single-pass bf16 MXU, f32 accumulate + output
    # (the mixed-precision mode; see contract._einsum).
    wt = W.T.astype(V.dtype)
    out_dtype = jnp.float32 if V.dtype == jnp.bfloat16 else V.dtype

    def vmem(spec_shape, index_map):
        if _VMEM is not None and not interpret:
            return pl.BlockSpec(spec_shape, index_map, memory_space=_VMEM)
        return pl.BlockSpec(spec_shape, index_map)

    if rank_minor:
        out = pl.pallas_call(
            _mid_kernel_t,
            grid=(P, nl),
            in_specs=[
                vmem((R, B), lambda p, l: (0, 0)),
                vmem((1, B, L), lambda p, l: (p, 0, l)),
            ],
            out_specs=vmem((1, L, R), lambda p, l: (p, l, 0)),
            out_shape=jax.ShapeDtypeStruct((P, Mp, R), out_dtype),
            interpret=interpret,
        )(wt, V3)
        if Mp != M:
            out = out[:, :M, :]
        return out.reshape(shape[:mode] + shape[mode + 1:] + (R,))
    out = pl.pallas_call(
        _mid_kernel,
        grid=(P, nl),
        in_specs=[
            vmem((R, B), lambda p, l: (0, 0)),
            vmem((1, B, L), lambda p, l: (p, 0, l)),
        ],
        out_specs=vmem((1, R, L), lambda p, l: (p, 0, l)),
        out_shape=jax.ShapeDtypeStruct((P, R, Mp), out_dtype),
        interpret=interpret,
    )(wt, V3)
    if Mp != M:
        out = out[:, :, :M]
    # physical layout is rank-major; expose the rank-last convention via a
    # lazy transpose — XLA folds it into the consuming einsum/dot.
    out = out.reshape(shape[:mode] + (R,) + shape[mode + 1:])
    return jnp.moveaxis(out, mode, -1)


# ---------------------------------------------------------------------------
# Minor (last) mode contraction: plain tiled GEMM
# ---------------------------------------------------------------------------


def _last_kernel(v_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(v_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=_dot_prec(v_ref.dtype)).astype(o_ref.dtype)


def _last_tile(N: int, B: int) -> int:
    for Tr in (512, 256, 128, 64, 32, 16, 8):
        if Tr * B * 4 <= (4 << 20) and N % Tr == 0:
            return Tr
    return 0


def last_contract_eligible(shape, dtype, r: int) -> bool:
    if dtype not in (jnp.float32,) or r > 256:
        return False
    B = shape[-1]
    N = 1
    for s in shape[:-1]:
        N *= s
    if B < 128 or B > 65536 or N < 8:
        return False
    return _last_tile(N, B) > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def last_contract(V, W, interpret: bool = False):
    """V x_{order-1} W: the minor-mode first-level contraction as a tiled
    (rows, B) @ (B, R) GEMM with full-K blocks. Output axes: leading modes
    + rank (already the rank-last convention)."""
    shape = V.shape
    B = shape[-1]
    R = W.shape[1]
    N = 1
    for s in shape[:-1]:
        N *= s
    V2 = V.reshape(N, B)
    Tr = _last_tile(N, B)

    def vmem(spec_shape, index_map):
        if _VMEM is not None and not interpret:
            return pl.BlockSpec(spec_shape, index_map, memory_space=_VMEM)
        return pl.BlockSpec(spec_shape, index_map)

    out = pl.pallas_call(
        _last_kernel,
        grid=(N // Tr,),
        in_specs=[
            vmem((Tr, B), lambda i: (i, 0)),
            vmem((B, R), lambda i: (0, 0)),
        ],
        out_specs=vmem((Tr, R), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, R), V.dtype),
        interpret=interpret,
    )(V2, W)
    return out.reshape(shape[:-1] + (R,))


# ---------------------------------------------------------------------------
# Triple chain-root kernel: all three PP cache-build first-level
# contractions in ONE pass over V
# ---------------------------------------------------------------------------
#
# The PP cache build's memoized chains (contract.build_pp_caches) bottom
# out in three distinct first-level contractions ("roots") — one per
# largest mode — and each root re-reads the full tensor: on coil-100
# (3, 128, 128, 7200) that is 3 x 1.4 GB of HBM traffic, the dominant
# cost of the 7.6 ms build. When the three roots are axes {1, 2, 3} with
# a small batch axis 0 (exactly the coil-100 class), one kernel can
# compute all three partial contractions per V tile.
#
# MEASURED NEGATIVE RESULT on v5e (round 4): 11-12 ms fused vs 7.4 ms
# for the XLA 3-pass chain, at L in {128, 256} (L=512 exceeds physical
# VMEM with double buffering). Serving three different-axis contractions
# from one resident tile forces the V block's contiguous DMA chunk down
# to L*4 <= 1 KB (the tensor's 7200-wide minor dim is strided across the
# tile) and every GEMM has an R=10 narrow dim; together they cost more
# than the two saved 1.4 GB HBM passes. Kept as a correct, oracle-tested
# experimental path (config.use_pallas_triple, default OFF) — the XLA
# chain stays the production build. Pattern precedent: round 1's
# use_pallas_first finding (single-root kernel also lost to XLA here).
#
#   for each grid step (p, l) with tile v = V[p, :, :, lL:(l+1)L]:
#     O1[:, p, :, lL:] = W1^T (B1, x) v          # contract axis 1
#     O2[:, p, :, lL:] = W2^T (B2, x) v          # contract axis 2
#     O3[:, p, :, :]  += v (L, x) W3[lL:(l+1)L]  # contract axis 3 (acc)
#
# Outputs are RANK-MAJOR — the chain convention of build_pp_caches — so
# they drop straight into the memo as the (m,) prefixes.


def _triple_kernel(w1_ref, w2_ref, w3_ref, v_ref, mrow_ref,
                   o1_ref, o2_ref, o3_ref):
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        o3_ref[:] = jnp.zeros_like(o3_ref)

    v = v_ref[0]                                   # (B1, B2, L)
    if v.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        v = v.astype(jnp.float32)
    b1, b2, L = v.shape
    # mask the ragged last lane tile: OOB lanes hold unspecified values
    # (NaN under interpret) and O3 CONTRACTS the lane axis, so they must
    # be neutralized with a select — a multiply would keep NaN*0 = NaN
    # (O1/O2 only write them into sliced-off output columns, but zeros
    # are safe there too)
    v = jnp.where(mrow_ref[0, 0][None, None, :] > 0, v,
                  jnp.zeros_like(v))
    prec = _dot_prec(v.dtype)
    w1 = w1_ref[:]                                 # (R, B1)
    w2 = w2_ref[:]                                 # (R, B2)
    w3 = w3_ref[:]                                 # (L, R)
    if w1.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        w1, w2, w3 = (x.astype(jnp.float32) for x in (w1, w2, w3))
    # All three contractions as single 2D GEMMs (a non-2D dot_general
    # lowers to per-row matmul loops in Mosaic — measured 1.5x slower
    # than the whole plain chain build):
    # O1: (R, B1) @ (B1, B2*L)
    g1 = jax.lax.dot_general(w1, v.reshape(b1, b2 * L),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
    o1_ref[:, 0] = g1.reshape(-1, b2, L).astype(o1_ref.dtype)
    # O2: transpose the tile's two sublane dims once, then
    # (R, B2) @ (B2, B1*L)
    vt = jnp.transpose(v, (1, 0, 2)).reshape(b2, b1 * L)
    g2 = jax.lax.dot_general(w2, vt, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
    o2_ref[:, 0] = g2.reshape(-1, b1, L).astype(o2_ref.dtype)
    # O3: (B1*B2, L) @ (L, R), accumulated over the l grid
    g3 = jax.lax.dot_general(v.reshape(b1 * b2, L), w3,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
    o3_ref[:, 0] += jnp.transpose(g3.reshape(b1, b2, -1),
                                  (2, 0, 1)).astype(o3_ref.dtype)


def _triple_tile(B1: int, B2: int, M: int, itemsize: int = 4) -> int:
    """Lane tile L: largest power-of-two block <= ~32 MiB of V. A wide
    L is the DMA-efficiency lever: the V block's contiguous chunk is
    L * itemsize bytes (the tensor's minor dim is strided across the
    tile), and sub-2KB chunks measured DMA-bound."""
    for L in (1024, 512, 256, 128):
        if B1 * B2 * L * itemsize <= (16 << 20) and M >= L:
            return L
    return 0


def triple_roots_eligible(shape, dtype, r: int) -> bool:
    """Order-4, roots on axes {1,2,3}, mid axes tile-friendly, long minor
    axis. The caller must separately confirm the chain priority actually
    roots at axes {1,2,3} (i.e. axis 0 is the smallest mode)."""
    if len(shape) != 4 or dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if r > 128:
        return False
    P, B1, B2, M = shape
    if B1 % 8 or B2 % 8 or B1 < 8 or B2 < 8 or B1 > 512 or B2 > 512:
        return False
    if M < 1024 or P > 64:
        return False
    return _triple_tile(B1, B2, M) > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def triple_roots(V, W1, W2, W3, interpret: bool = False):
    """(O1, O2, O3) rank-major chain roots contracting axes 1, 2, 3 of an
    order-4 tensor in one HBM pass:

      O1[r, p, b2, m] = sum_{b1} V[p, b1, b2, m] W1[b1, r]
      O2[r, p, b1, m] = sum_{b2} V[p, b1, b2, m] W2[b2, r]
      O3[r, p, b1, b2] = sum_{m} V[p, b1, b2, m] W3[m, r]
    """
    P, B1, B2, M = V.shape
    R = W1.shape[1]
    L = _triple_tile(B1, B2, M) or M
    nl = pl.cdiv(M, L)
    Mp = nl * L
    out_dtype = jnp.float32 if V.dtype == jnp.bfloat16 else V.dtype
    wt1 = W1.T.astype(V.dtype)
    wt2 = W2.T.astype(V.dtype)
    w3 = W3.astype(V.dtype)
    if Mp != M:
        w3 = jnp.pad(w3, ((0, Mp - M), (0, 0)))
    # lane-validity row per tile (masks the ragged last tile's OOB
    # lanes); shaped (nl, 1, L) so the block's trailing two dims satisfy
    # Mosaic's (8, 128)-divisible-or-full rule
    mask = (jnp.arange(Mp, dtype=jnp.int32) < M).astype(V.dtype)
    mask = mask.reshape(nl, 1, L)

    def vmem(spec_shape, index_map):
        if _VMEM is not None and not interpret:
            return pl.BlockSpec(spec_shape, index_map, memory_space=_VMEM)
        return pl.BlockSpec(spec_shape, index_map)

    compiler_params = None
    if pltpu is not None and not interpret:
        # the v tile (8 MiB) + three output blocks + pipelining doubles
        # exceed Mosaic's default 16 MiB scoped-vmem budget; v5e has
        # 128 MiB of VMEM, so raise the cap for this kernel
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    o1, o2, o3 = pl.pallas_call(
        _triple_kernel,
        compiler_params=compiler_params,
        grid=(P, nl),
        in_specs=[
            vmem((R, B1), lambda p, l: (0, 0)),
            vmem((R, B2), lambda p, l: (0, 0)),
            vmem((L, R), lambda p, l: (l, 0)),
            vmem((1, B1, B2, L), lambda p, l: (p, 0, 0, l)),
            vmem((1, 1, L), lambda p, l: (l, 0, 0)),
        ],
        out_specs=[
            vmem((R, 1, B2, L), lambda p, l: (0, p, 0, l)),
            vmem((R, 1, B1, L), lambda p, l: (0, p, 0, l)),
            vmem((R, 1, B1, B2), lambda p, l: (0, p, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, P, B2, Mp), out_dtype),
            jax.ShapeDtypeStruct((R, P, B1, Mp), out_dtype),
            jax.ShapeDtypeStruct((R, P, B1, B2), out_dtype),
        ],
        interpret=interpret,
    )(wt1, wt2, w3, V, mask)
    if Mp != M:
        o1 = o1[..., :M]
        o2 = o2[..., :M]
    return o1, o2, o3
