#!/bin/bash
# Round-3 rebuild of the reference-scale synthetic run (DEVNOTES recipe).
# Produces runs/r3/{raw,npz,split,pack_train,pack_val,train} and a trained
# checkpoint for the distillation + conditioning-steering work.
set -e
cd /root/repo
R=runs/r3
mkdir -p $R
echo "[pipeline] corpus"           && python scripts/make_synth_corpus.py $R/raw 1868
echo "[pipeline] preprocess"       && python -m lm2a_tpu.cli preprocess --root $R/raw --out $R/npz --lyrics_backend hashed
echo "[pipeline] split"            && python -m lm2a_tpu.cli split --npz_dir $R/npz --out_dir $R/split --seed 42 --move
echo "[pipeline] pack train"       && python -m lm2a_tpu.cli pack --npz_dir $R/split/train --out_dir $R/pack_train
echo "[pipeline] pack val"         && python -m lm2a_tpu.cli pack --npz_dir $R/split/val --out_dir $R/pack_val
echo "[pipeline] train 200 epochs" && python -m lm2a_tpu.cli train \
    --npz_dir $R/pack_train --val_npz_dir $R/pack_val \
    --epochs 200 --steps_per_call 81 --device_data \
    --save_interval 8100 --keep_checkpoints 3 \
    --save_dir $R/train --no_tensorboard
echo "[pipeline] DONE"
