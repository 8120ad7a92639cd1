#!/bin/bash
# parity with reference scripts/run_nerf.sh: blender lego with -O settings
set -e
DATA=${1:-data/nerf_synthetic/lego}
python -m tngp.cli.main_nerf "$DATA" -O --workspace trial_nerf_lego \
  --bound 1.0 --scale 0.8 --dt_gamma 0 "$@"
