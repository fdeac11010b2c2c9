#!/bin/bash
# Round-5 data pipeline on the TWO-PROPERTY lyric-coupled corpus
# (VERDICT r4 #8: envelope rate AND harmonic stack density are both
# lyric-controlled). Rebuilds the 500-epoch teacher — round-5 runs on a
# fresh machine, so runs/r4 artifacts no longer exist.
# Corpus must already exist at runs/r5/raw (scripts/make_synth_corpus.py).
set -e
cd /root/repo
R=runs/r5
echo "[pipeline] preprocess" && python -m lm2a_tpu.cli preprocess --root $R/raw --out $R/npz --lyrics_backend hashed
echo "[pipeline] split"      && python -m lm2a_tpu.cli split --npz_dir $R/npz --out_dir $R/split --seed 42 --move
echo "[pipeline] pack train" && python -m lm2a_tpu.cli pack --npz_dir $R/split/train --out_dir $R/pack_train
echo "[pipeline] pack val"   && python -m lm2a_tpu.cli pack --npz_dir $R/split/val --out_dir $R/pack_val
echo "[pipeline] train 500 epochs" && python -m lm2a_tpu.cli train \
    --npz_dir $R/pack_train --val_npz_dir $R/pack_val \
    --epochs 500 --steps_per_call 81 --device_data \
    --save_interval 20000 --keep_checkpoints 3 \
    --save_dir $R/train --no_tensorboard
echo "[pipeline] DONE"
