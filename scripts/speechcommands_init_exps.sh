#!/usr/bin/env bash
# SpeechCommands-v2 initializer-sweep experiments
# (reference: speechcommands_init_exps.sh:3-11 — cfg × seed × expdir grid).
set -euo pipefail
EXP_ROOT=${EXP_ROOT:-./experiments/scv2_init_sweep}
EPOCHS=${EPOCHS:-100}
for cfg in efficientnet-b0-leaf-default_random \
           efficientnet-b0-leaf-default_kaiming \
           efficientnet-b0-leaf-default_xavier; do
  for seed in 8881 8882 8883 8884 8885; do
    python train.py \
      --cfg_file "cfgs/speechcommands/${cfg}.cfg" \
      --expdir "${EXP_ROOT}/${cfg}_seed${seed}" \
      --epochs "${EPOCHS}" \
      --random_seed "${seed}"
  done
done
