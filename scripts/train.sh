#!/usr/bin/env bash
# Training on the converted DTU dataset (counterpart of the reference train.sh).
MVS_TRAINING="/data/dtu_training/"
python -m patchmatchnet_tpu.cli train \
    --input_folder "$MVS_TRAINING" \
    --train_list lists/dtu/train.txt --test_list lists/dtu/val.txt \
    --num_light_idx 7 --image_extension .jpg --batch_size 8 --epochs 16 "$@"
