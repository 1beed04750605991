#!/usr/bin/env bash
# VoxCeleb1 speaker-ID runs (reference: voxceleb_run.sh:7-8).
set -euo pipefail
EXP_ROOT=${EXP_ROOT:-./experiments/voxceleb}
EPOCHS=${EPOCHS:-100}
for cfg in efficientnet-b0-leaf-default resnet-18-leaf-default; do
  for seed in 8881 8882 8883 8884 8885; do
    python train.py \
      --cfg_file "cfgs/voxceleb/${cfg}.cfg" \
      --expdir "${EXP_ROOT}/${cfg}_seed${seed}" \
      --epochs "${EPOCHS}" \
      --random_seed "${seed}"
  done
done
