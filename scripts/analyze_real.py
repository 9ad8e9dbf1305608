"""Equal-fitness time-to-residual analysis: TPU framework vs measured CPU
baseline on the real-data (stand-in) benchmark grid.

Reads results/real_*.csv (framework, reference CSV schema) and
results/baseline_*.csv (numpy-f64 baseline), computes for each matched
pair the wall time each solver needs to reach the SAME fitness target
(the worse of the two final fitnesses, so both demonstrably reach it),
and writes results/REAL_DATA.md plus a machine-readable
results/REAL_DATA.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "results")


def read_csv(path):
    rows = []
    with open(path) as fh:
        header = fh.readline()
        for line in fh:
            parts = line.strip().split(",")
            if len(parts) < 7:
                continue
            rows.append(dict(iter=int(float(parts[1])),
                             metric=float(parts[2]),
                             pp=int(float(parts[4])),
                             diffV=float(parts[5]),
                             dtime=float(parts[6])))
    return rows


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fitness import (final_row_fitness, sustained_fitness,  # noqa: E402
                     time_to_sustained)


def main():
    pairs = [
        # (label, framework csv, baseline csv)
        ("coil CP DT (f32)", "real_coil_cp_pp0_rt0.1_f32.csv",
         "baseline_coil_cp_dt.csv"),
        ("coil CP PP rt=0.1 (f32)", "real_coil_cp_pp1_rt0.1_f32.csv",
         "baseline_coil_cp_pp.csv"),
        ("coil CP DT (bf16 V)", "real_coil_cp_pp0_rt0.1_bf16.csv",
         "baseline_coil_cp_dt.csv"),
        ("coil CP PP rt=0.1 (bf16 V)", "real_coil_cp_pp1_rt0.1_bf16.csv",
         "baseline_coil_cp_pp.csv"),
        ("coil Tucker DT", "real_coil_tucker_pp0_rt0.5.csv",
         "baseline_coil_tucker.csv"),
        ("time-lapse CP DT (f32)", "real_timelapse_cp_pp0_rt0.1_f32.csv",
         "baseline_timelapse_cp_dt.csv"),
        ("time-lapse CP PP rt=0.1 (f32)",
         "real_timelapse_cp_pp1_rt0.1_f32.csv",
         "baseline_timelapse_cp_dt.csv"),
        ("time-lapse Tucker DT", "real_timelapse_tucker_pp0_rt0.5.csv",
         "baseline_timelapse_tucker.csv"),
    ]
    out_rows = []
    for label, fw_csv, base_csv in pairs:
        fw_path = os.path.join(RESULTS, fw_csv)
        base_path = os.path.join(RESULTS, base_csv)
        if not (os.path.exists(fw_path) and os.path.exists(base_path)):
            print(f"skip {label}: missing "
                  f"{fw_csv if not os.path.exists(fw_path) else base_csv}")
            continue
        fw = read_csv(fw_path)
        base = read_csv(base_path)
        if not fw or not base:
            continue
        # sustained metric (VERDICT r3 weak #2): target = the worse of
        # the two SUSTAINED fitness levels (min of final quartile), and
        # attainment requires >= 3 consecutive logged rows at or below it
        fw_final = sustained_fitness(fw)
        base_final = sustained_fitness(base)
        # equal fitness up to 1e-4 RELATIVE: logged rows oscillate at
        # that level on their plateaus, so a tighter band turns
        # sub-resolution differences into spurious 'never's
        target = max(fw_final, base_final) * 1.0001
        t_fw, it_fw = time_to_sustained(fw, target)
        t_b, it_b = time_to_sustained(base, target)
        speedup = (t_b / t_fw) \
            if (t_b is not None and t_fw) else None
        out_rows.append(dict(
            label=label, target_fitness=target,
            fw_final=fw_final, base_final=base_final,
            fw_last_row=final_row_fitness(fw),
            base_last_row=final_row_fitness(base),
            fw_seconds=t_fw, fw_iters=it_fw,
            base_seconds=t_b, base_iters=it_b,
            speedup=speedup))

    md = ["# Real-data (stand-in) equal-fitness results",
          "",
          "Datasets are GENERATED stand-ins (scripts/make_datasets.py — "
          "no network egress in this environment); file layout, shapes, "
          "dtype and value ranges match the reference pipeline "
          "(script/imageloader.py, script/matloader.py) exactly.",
          "",
          "Baseline: single-process numpy f64, reference ALS semantics "
          "with the dimension-tree FLOP structure "
          "(scripts/baseline_cpu.py), measured on a 2-core host of the "
          "same class as this build environment (results/baseline_*.csv; "
          "seeded stand-in datasets are byte-identical across machines). "
          "Framework: one TPU v5e chip.",
          "",
          "`time-to-fitness` = wall seconds (diagnostics excluded, "
          "reference accounting) until diffV reaches the target "
          "SUSTAINED — target = the worse of the two runs' sustained "
          "fitness (min of final-quartile logged rows, not a transient "
          "dip) within a 1e-4 relative equal-fitness band (plateau "
          "oscillation resolution), attainment = >= 3 consecutive "
          "logged rows at/below it or held to end-of-run. `last row` = "
          "the fitness each run actually ended at.",
          "",
          "| config | target diffV | TPU s (iters) | CPU s (iters) "
          "| speedup | TPU last row | CPU last row |",
          "|---|---|---|---|---|---|---|"]
    for r in out_rows:
        fw_s = f"{r['fw_seconds']:.2f} ({r['fw_iters']})" \
            if r["fw_seconds"] is not None else "n/a"
        b_s = f"{r['base_seconds']:.1f} ({r['base_iters']})" \
            if r["base_seconds"] is not None else "n/a"
        sp = f"**{r['speedup']:.0f}x**" if r["speedup"] else "n/a"
        md.append(f"| {r['label']} | {r['target_fitness']:.4e} | {fw_s} "
                  f"| {b_s} | {sp} | {r['fw_last_row']:.4e} "
                  f"| {r['base_last_row']:.4e} |")
    # ---- PP vs DT inside the framework (the flagship comparison; the
    # CPU-baseline speedups above deliberately do NOT answer it) ----
    ppdt_pairs = [
        ("coil CP f32 rt=0.1", "real_coil_cp_pp0_rt0.1_f32.csv",
         "real_coil_cp_pp1_rt0.1_f32.csv"),
        ("coil CP f32 rt=0.05", "real_coil_cp_pp0_rt0.1_f32.csv",
         "real_coil_cp_pp1_rt0.05_f32.csv"),
        ("coil CP bf16-V rt=0.1", "real_coil_cp_pp0_rt0.1_bf16.csv",
         "real_coil_cp_pp1_rt0.1_bf16.csv"),
        ("coil CP bf16-V rt=0.05", "real_coil_cp_pp0_rt0.1_bf16.csv",
         "real_coil_cp_pp1_rt0.05_bf16.csv"),
        ("time-lapse CP f32 rt=0.1", "real_timelapse_cp_pp0_rt0.1_f32.csv",
         "real_timelapse_cp_pp1_rt0.1_f32.csv"),
        ("time-lapse CP f32 rt=0.05", "real_timelapse_cp_pp0_rt0.1_f32.csv",
         "real_timelapse_cp_pp1_rt0.05_f32.csv"),
        ("time-lapse CP bf16-V rt=0.1",
         "real_timelapse_cp_pp0_rt0.1_bf16.csv",
         "real_timelapse_cp_pp1_rt0.1_bf16.csv"),
        ("time-lapse CP bf16-V rt=0.05",
         "real_timelapse_cp_pp0_rt0.1_bf16.csv",
         "real_timelapse_cp_pp1_rt0.05_bf16.csv"),
        ("coil Tucker rt=0.5", "real_coil_tucker_pp0_rt0.5.csv",
         "real_coil_tucker_pp1_rt0.5.csv"),
        ("time-lapse Tucker rt=0.5", "real_timelapse_tucker_pp0_rt0.5.csv",
         "real_timelapse_tucker_pp1_rt0.5.csv"),
    ]
    ppdt_rows = []
    for label, dt_csv, pp_csv in ppdt_pairs:
        dp, pp_p = (os.path.join(RESULTS, dt_csv),
                    os.path.join(RESULTS, pp_csv))
        if not (os.path.exists(dp) and os.path.exists(pp_p)):
            continue
        dt_rows, pp_rows = read_csv(dp), read_csv(pp_p)
        if not dt_rows or not pp_rows:
            continue
        dt_final = sustained_fitness(dt_rows)
        pp_final = sustained_fitness(pp_rows)
        target = max(dt_final, pp_final) * 1.0001  # 1e-4 relative band
        t_dt, it_dt = time_to_sustained(dt_rows, target)
        t_pp, it_pp = time_to_sustained(pp_rows, target)
        if it_dt == 0 or it_pp == 0:
            # the weaker solver's final fitness was already met at the
            # shared initialization — a time ratio would be meaningless
            sp = None
        else:
            sp = (t_dt / t_pp) \
                if (t_dt is not None and t_pp) else None
        ppdt_rows.append(dict(label=label, target=target, dt_seconds=t_dt,
                              pp_seconds=t_pp, dt_iters=it_dt,
                              pp_iters=it_pp, speedup=sp,
                              dt_last_row=final_row_fitness(dt_rows),
                              pp_last_row=final_row_fitness(pp_rows)))
    if ppdt_rows:
        md += ["", "## PP vs DT on the same chip (time-to-equal-fitness)",
               "",
               "DT = pipelined host driver; PP = fused device machine "
               "(`als_cp_pp_fused`). Same init factors, honest dtime, "
               "sustained-fitness rule (>= 3 consecutive logged rows "
               "at/below a final-quartile target).",
               "",
               "| config | target diffV | DT s (iters) | PP s (iters) | "
               "PP speedup | DT last row | PP last row |",
               "|---|---|---|---|---|---|---|"]
        for r in ppdt_rows:
            dts = f"{r['dt_seconds']:.2f} ({r['dt_iters']})" \
                if r["dt_seconds"] is not None else "never"
            pps = f"{r['pp_seconds']:.2f} ({r['pp_iters']})" \
                if r["pp_seconds"] is not None else "never"
            sp = f"**{r['speedup']:.2f}x**" if r["speedup"] else "n/a"
            md.append(f"| {r['label']} | {r['target']:.4e} | {dts} | "
                      f"{pps} | {sp} | {r['dt_last_row']:.4e} | "
                      f"{r['pp_last_row']:.4e} |")
    md += [
        "",
        "### Findings (round 5)",
        "",
        "CP: PP beats DT on all eight configs (1.5-3.1x) under the "
        "sustained rule — the round-3 instability artifacts are gone "
        "(solver guards + refined f32 solves), so every trajectory "
        "plateaus monotonically and the comparison is clean.",
        "",
        "Tucker: DO NOT read the Tucker PP-vs-DT rows above as a "
        "controlled comparison — the grid runs each engine once per "
        "process and the FIRST engine executed carries ~8 ms/sweep of "
        "one-time relay dispatch overhead (the pp0 run goes first, so "
        "these rows flatter PP). The controlled, warm-run comparison "
        "is results/TUCKER_PP.md, and its verdict is that Tucker PP "
        "LOSES on time-to-fitness (0.3-0.8x at the 90%-improvement "
        "level): Tucker-ALS from an HOSVD init covers 90% of its "
        "achievable improvement in ~10 roofline-speed DT sweeps "
        "(~30 ms total race on coil), and PP's own DT-preconditioner "
        "phases plus a cache build consume that runway before its "
        "cheap sweeps can pay. Round 5 still made the PP sweeps "
        "~1.5x faster (PP-auto warm subspace extraction) — the loss "
        "is structural (the short race), not implementation. The "
        "time-lapse Tucker rows are additionally degenerate: at ranks "
        "(10,100,100,5) the HOSVD init is already below the CPU "
        "baseline final fitness, so DT converges in ~1 sweep. All of "
        "this is a property of the reference's own benchmark ranks "
        "on this hardware class, not an implementation gap.",
    ]
    md.append("")
    with open(os.path.join(RESULTS, "REAL_DATA.md"), "w") as f:
        f.write("\n".join(md))
    out = dict(vs_baseline=out_rows, pp_vs_dt=ppdt_rows)
    with open(os.path.join(RESULTS, "REAL_DATA.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("\n".join(md))


if __name__ == "__main__":
    main()
