#!/bin/bash
set -e
DATA=${1:-data/nerf_synthetic/hotdog}
python -m tngp.cli.main_ccnerf "$DATA" -O --workspace trial_cc \
  --bound 1.0 --scale 0.8 --dt_gamma 0 "$@"
