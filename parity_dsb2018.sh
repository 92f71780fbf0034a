#!/usr/bin/env bash
# Real-data IoU-parity protocol: executes the reference README's DSB2018 recipe
# verbatim against this framework (reference README.md:50-109; published
# numbers to match: UNet 0.839 / NestedUNet woDS 0.842 / NestedUNet wDS 0.843
# val IoU at 96x96, LovaszHingeLoss, SGD momentum 0.9 wd 1e-4, cosine 100
# epochs, batch 16, split seed 41).
#
# Run the moment the DSB2018 stage1_train data is available:
#   ./parity_dsb2018.sh /path/to/stage1_train [EPOCHS]
#
# The synthetic-data equivalence evidence (same protocol, both frameworks,
# identical init/data/schedule) is produced by parity.py and recorded in
# PARITY.md — this script is the final, data-dependent gate.
set -euo pipefail

STAGE1=${1:?usage: $0 /path/to/dsb2018/stage1_train [epochs]}
EPOCHS=${2:-100}
cd "$(dirname "$0")"

# 1. offline preprocessing (reference preprocess_dsb2018.py:9-50 semantics:
#    mask union >127, gray->3ch, RGBA strip, resize 96x96)
python preprocess_dsb2018.py --src "$STAGE1" --out inputs --img_size 96

run () {  # arch, ds, name
  python train.py --dataset dsb2018_96 --arch "$1" --deep_supervision "$2" \
    --loss LovaszHingeLoss --epochs "$EPOCHS" --batch_size 16 \
    --optimizer SGD --lr 1e-3 --momentum 0.9 --weight_decay 1e-4 \
    --scheduler CosineAnnealingLR --min_lr 1e-5 --input_w 96 --input_h 96
  python val.py --name "dsb2018_96_$3"
}

# 2. the three README rows
run UNet false UNet_woDS
run NestedUNet false NestedUNet_woDS
run NestedUNet true NestedUNet_wDS

echo "-----------------------------------------------------------------------"
echo "Compare best val IoU above with the reference README (0.839/0.842/0.843)"
echo "gate: within ±0.01 of the published numbers"
