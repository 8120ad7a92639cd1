#!/bin/bash
set -e
DATA=${1:-data/dnerf/jumpingjacks}
python -m tngp.cli.main_dnerf "$DATA" -O --workspace trial_dnerf \
  --bound 1.0 --scale 0.8 --dt_gamma 0 "$@"
