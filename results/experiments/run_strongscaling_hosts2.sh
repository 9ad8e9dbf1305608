#!/bin/bash
set -e

python -m pairwise_perturbation_tpu.cli pp_bench -model CP -tensor r -dim 6 -size 50 -rank 6 -maxiter 5 -resprint 1 -mesh 8 -filename bench_CP_r_hosts=2.csv
python -m pairwise_perturbation_tpu.cli pp_bench -model Tucker -tensor r2 -dim 6 -size 50 -rank 6 -maxiter 5 -resprint 1 -mesh 8 -filename bench_Tucker_r2_hosts=2.csv
python -m pairwise_perturbation_tpu.cli pp_bench -model CP -tensor r -dim 6 -size 50 -rank 6 -maxiter 5 -resprint 1 -mesh 8 -filename bench_CP_r_hosts=2.csv
python -m pairwise_perturbation_tpu.cli pp_bench -model Tucker -tensor r2 -dim 6 -size 50 -rank 6 -maxiter 5 -resprint 1 -mesh 8 -filename bench_Tucker_r2_hosts=2.csv
python -m pairwise_perturbation_tpu.cli pp_bench -model CP -tensor r -dim 6 -size 50 -rank 6 -maxiter 5 -resprint 1 -mesh 8 -filename bench_CP_r_hosts=2.csv
python -m pairwise_perturbation_tpu.cli pp_bench -model Tucker -tensor r2 -dim 6 -size 50 -rank 6 -maxiter 5 -resprint 1 -mesh 8 -filename bench_Tucker_r2_hosts=2.csv
python -m pairwise_perturbation_tpu.cli pp_bench -model CP -tensor r -dim 6 -size 50 -rank 6 -maxiter 5 -resprint 1 -mesh 8 -filename bench_CP_r_hosts=2.csv
python -m pairwise_perturbation_tpu.cli pp_bench -model Tucker -tensor r2 -dim 6 -size 50 -rank 6 -maxiter 5 -resprint 1 -mesh 8 -filename bench_Tucker_r2_hosts=2.csv
python -m pairwise_perturbation_tpu.cli pp_bench -model CP -tensor r -dim 6 -size 50 -rank 6 -maxiter 5 -resprint 1 -mesh 8 -filename bench_CP_r_hosts=2.csv
python -m pairwise_perturbation_tpu.cli pp_bench -model Tucker -tensor r2 -dim 6 -size 50 -rank 6 -maxiter 5 -resprint 1 -mesh 8 -filename bench_Tucker_r2_hosts=2.csv
