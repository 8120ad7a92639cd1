#!/bin/bash
set -e
DATA=${1:-data/nerf_synthetic/lego}
python -m tngp.cli.main_tensorf "$DATA" -O --workspace trial_tensoRF \
  --bound 1.0 --scale 0.8 --dt_gamma 0 "$@"
