#!/bin/bash
# Round-4 distillation gate sweep (VERDICT r3 #1) against the 500-epoch
# lyric-coupled teacher. Baselines first, then students in increasing
# ambition; each stage checkpoint is evaluated with the same 6-clip
# protocol (eval_distilled / ddim_baseline_row share clips + seeds).
#
# Usage: round4_distill_sweep.sh <teacher_ckpt_dir>
set -e
cd /root/repo
TEACHER=${1:?teacher ckpt dir}
TEST=runs/r4/split/test
PACK=runs/r4/pack_train
OUT=runs/r4
LOG=runs/r4/distill_sweep.log

run() { echo "=== $* ===" | tee -a $LOG; "$@" 2>&1 | tee -a $LOG; }

# ---- baselines on the teacher (the gate rows) ----
run python scripts/ddim_baseline_row.py "$TEACHER" $TEST 6 100 2.1 ddim
run python scripts/ddim_baseline_row.py "$TEACHER" $TEST 6 50 2.1 ddim
run python scripts/ddim_baseline_row.py "$TEACHER" $TEST 6 1000 2.1 ddpm

# ---- A: r2 recipe (reference point): 100->50, x0_snr, 600/stage ----
run python -m lm2a_tpu.cli distill --teacher "$TEACHER" --npz_dir $PACK \
    --save_dir $OUT/distill_a --student_steps 50 --start_steps 100 \
    --steps_per_stage 600 --steps_per_call 25 --batch_size 16
run python scripts/eval_distilled.py $OUT/distill_a/ckpt_step_600 $TEST 6
run python scripts/eval_distilled.py $OUT/distill_a/ckpt_step_1200 $TEST 6

# ---- B: longer stages + cosine LR (convergence lever) ----
run python -m lm2a_tpu.cli distill --teacher "$TEACHER" --npz_dir $PACK \
    --save_dir $OUT/distill_b --student_steps 50 --start_steps 100 \
    --steps_per_stage 3000 --steps_per_call 50 --batch_size 16 \
    --lr_decay cosine
run python scripts/eval_distilled.py $OUT/distill_b/ckpt_step_3000 $TEST 6
run python scripts/eval_distilled.py $OUT/distill_b/ckpt_step_6000 $TEST 6

# ---- C: eps loss at stage 1 (r2's winner there), x0_snr at stage 2 ----
run python -m lm2a_tpu.cli distill --teacher "$TEACHER" --npz_dir $PACK \
    --save_dir $OUT/distill_c --student_steps 50 --start_steps 100 \
    --steps_per_stage 3000 --steps_per_call 50 --batch_size 16 \
    --lr_decay cosine --loss_schedule eps,x0_snr
run python scripts/eval_distilled.py $OUT/distill_c/ckpt_step_3000 $TEST 6
run python scripts/eval_distilled.py $OUT/distill_c/ckpt_step_6000 $TEST 6

echo "=== sweep done; table rows in $LOG ==="
