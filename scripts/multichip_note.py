"""Multi-chip evidence within a single-chip environment (VERDICT r3
next #8): execute the full sharded dry-run (DT sweep, PP cache build,
PP sweep, fused machine, MSDT cycle, Tucker DT+PP) on virtual CPU
meshes of 8/16/32 devices, and tabulate analytic per-device HBM for the
sharded PP caches on the reference's order-6 weak-scaling shapes
(script_weakscaling.py:9-46: size = 32 n^(1/6), rank = 4 n^(1/6)).

Writes results/MULTICHIP_NOTE.md.

Usage: python scripts/multichip_note.py
"""

from __future__ import annotations

import math
import os
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def run_dryrun(n: int) -> tuple[bool, float, str]:
    """dryrun_multichip(n) in a fresh process on an n-device CPU mesh."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n}"
                        ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        f"import sys; sys.path.insert(0, {ROOT!r});\n"
        "import __graft_entry__ as g;\n"
        f"g.dryrun_multichip({n}); print('DRYRUN_OK')\n")
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable, "-c", code], env=env, cwd=ROOT,
                       capture_output=True, text=True, timeout=1800)
    ok = "DRYRUN_OK" in p.stdout
    return ok, time.perf_counter() - t0, (p.stdout + p.stderr)[-2000:]


def mesh_2d(n: int):
    for a in range(int(math.isqrt(n)), 0, -1):
        if n % a == 0:
            return (a, n // a) if a > 1 else (n,)
    return (n,)


def weak_scaling_hbm(n: int, dtype_bytes: int = 4):
    """Per-device bytes for V + PP pair/single caches at the order-6
    weak-scaling config on an n-chip mesh sharding the two largest modes
    (parallel/mesh.plan_layout semantics)."""
    order = 6
    s = round(32 * n ** (1 / 6))
    R = max(round(4 * n ** (1 / 6)), 1)
    axes = sorted(mesh_2d(n), reverse=True)  # mesh axis sizes
    # plan_layout: largest modes -> largest axes; all modes equal here,
    # so modes 0 and 1 get the two axes (or mode 0 the single axis)
    mode_div = {0: axes[0]}
    if len(axes) > 1:
        mode_div[1] = axes[1]
    v_bytes = s ** order * dtype_bytes / n
    pair_bytes = 0
    for i in range(order):
        for j in range(i + 1, order):
            div = mode_div.get(i, 1) * mode_div.get(j, 1)
            pair_bytes += R * s * s * dtype_bytes / div
    single_bytes = sum(s * R * dtype_bytes / mode_div.get(i, 1)
                      for i in range(order))
    return dict(n=n, size=s, rank=R, mesh="x".join(map(str, mesh_2d(n))),
                v_gb=v_bytes / 2 ** 30, pair_gb=pair_bytes / 2 ** 30,
                single_mb=single_bytes / 2 ** 20,
                total_gb=(v_bytes + pair_bytes + single_bytes) / 2 ** 30)


def main():
    lines = [
        "# Multi-chip evidence (virtual meshes; 1 physical chip in this "
        "environment)",
        "",
        "## Dry-run execution at 8/16/32 virtual devices",
        "",
        "`__graft_entry__.dryrun_multichip(n)`: n-device mesh, production "
        "layouts, one full sharded step of every engine (DT sweep, PP "
        "cache build + sweep, fused DT<->PP machine, MSDT cycle, Tucker "
        "HOSVD/DT/PP). HLO-level assertions (tests/test_parallel.py) "
        "separately pin collective reductions and forbid full-V gathers "
        "for the DT sweep, the fused CP and Tucker machines, and the "
        "constrained cache build.",
        "",
        "| devices | mesh | result | wall (s) |",
        "|---|---|---|---|",
    ]
    for n in (8, 16, 32):
        ok, dt, tail = run_dryrun(n)
        mesh = "x".join(map(str, mesh_2d(n)))
        lines.append(f"| {n} | {mesh} | {'ok' if ok else 'FAIL'} "
                     f"| {dt:.1f} |")
        print(f"n={n}: {'ok' if ok else 'FAIL'} in {dt:.1f}s", flush=True)
        if not ok:
            print(tail)
    lines += [
        "",
        "## Per-device HBM for sharded PP caches — order-6 weak scaling",
        "",
        "Reference config (script_weakscaling.py): size = 32 n^(1/6), "
        "rank = 4 n^(1/6), f32. Caches follow "
        "parallel/mesh.constrained_pp_caches: each pair cache (R, s_i, "
        "s_j) keeps its retained modes' mesh axes, so only pairs "
        "touching sharded modes divide. v5e budget: 15.75 GB/chip.",
        "",
        "| chips | size | rank | mesh | V GB/dev | pair caches GB/dev | "
        "singles MB/dev | total GB/dev |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for n in (1, 8, 16, 32, 64, 256, 1024):
        e = weak_scaling_hbm(n)
        lines.append(
            f"| {e['n']} | {e['size']} | {e['rank']} | {e['mesh']} | "
            f"{e['v_gb']:.2f} | {e['pair_gb']:.3f} | {e['single_mb']:.2f} "
            f"| {e['total_gb']:.2f} |")
    lines += [
        "",
        "Takeaway: at the reference's weak-scaling sizing, the per-device "
        "V block stays ~4 GB by construction and the O(N^2/2) pair "
        "caches are negligible (pair/V ratio = 15 R n / s^4, < 0.1% out "
        "to 1024 chips) — order-6 weak scaling fits v5e HBM at every "
        "node count with the two-mode sharding. Cache memory only "
        "becomes the binding constraint when strong-scaling a "
        "fixed-size tensor far past its V-per-device knee; "
        "constrained_pp_caches already shards pairs on their retained "
        "modes for that regime.",
        "",
    ]
    out = os.path.join(ROOT, "results", "MULTICHIP_NOTE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out)


if __name__ == "__main__":
    main()
