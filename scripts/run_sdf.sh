#!/bin/bash
set -e
MESH=${1:-data/armadillo.obj}
python -m tngp.cli.main_sdf "$MESH" --workspace trial_sdf --fp16
