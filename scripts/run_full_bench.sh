#!/usr/bin/env bash
# Full benchmark suite, split across processes.
#
# The TPU relay keeps every loaded executable alive for the life of a
# client process (jax.clear_caches() does not release device program
# memory server-side), so running ALL full-suite sections in one process
# exhausts the chip while loading later executables (observed as
# RESOURCE_EXHAUSTED on the chain_step_lr load). Each part below fits
# comfortably on its own; the JSON lines are merged into
# results/BENCH_full_manual.json.
#
# Usage: bash scripts/run_full_bench.sh
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p results /tmp/ppbench

run_part() {
    local name="$1" sections="$2"
    echo "=== part ${name}: sections=${sections}" >&2
    PP_BENCH_FULL=1 PP_BENCH_SECTIONS="${sections}" \
        timeout 7200 python bench.py > "/tmp/ppbench/${name}.json"
    tail -c 200 "/tmp/ppbench/${name}.json" >&2; echo >&2
}

# "head" = the heavyweight headline sub-benches (planner/pp/msdt/o3/
# bf16 timings); lean parts skip them so their process loads only the
# executables its own sections need. The LR optimizers get a part of
# their own: their chain programs' scratch reservations only fit when
# the process loaded almost nothing else.
run_part dense "head,o3512,dense6"  # headline + 512^3 + order-6 + Tucker
run_part pu    "pu"                 # PP partial-update (pp=2)
run_part lrdt   "lrdt"              # DT-LR (run pp=2)
run_part lrmsdt "lrmsdt"            # MSDT-LR (run pp=3)
run_part tl    "tl"                 # time-lapse + bf16 o3 + sparse

python - << 'EOF'
import json
merged = {}
for name in ("dense", "pu", "lrdt", "lrmsdt", "tl"):
    d = json.loads(open(f"/tmp/ppbench/{name}.json").read().strip()
                   .splitlines()[-1])
    if d.get("error"):
        raise SystemExit(f"part {name} failed: {d['error']}")
    # dense runs first and carries the full headline; lean parts only
    # contribute keys the earlier parts don't have (their own sections —
    # their headline value/vs_baseline are 0.0 placeholders)
    merged.update({k: v for k, v in d.items()
                   if k not in merged or merged[k] in (0.0, None)})
json.dump(merged, open("results/BENCH_full_manual.json", "w"),
          indent=1, sort_keys=True)
print("merged", len(merged), "keys -> results/BENCH_full_manual.json")
EOF
