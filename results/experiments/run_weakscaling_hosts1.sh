#!/bin/bash
set -e

python -m pairwise_perturbation_tpu.cli pp_bench -model CP -tensor r -dim 6 -size 32 -rank 4 -maxiter 5 -resprint 1 -mesh 4 -filename bench_CP_r_weak_hosts=1.csv
python -m pairwise_perturbation_tpu.cli pp_bench -model Tucker -tensor r2 -dim 6 -size 32 -rank 4 -maxiter 5 -resprint 1 -mesh 4 -filename bench_Tucker_r2_weak_hosts=1.csv
