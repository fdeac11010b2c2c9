#!/bin/bash
# Round-5 few-step frontier sweep (VERDICT r4 #2): push direct
# distillation below 50 steps with the winning round-4 recipe
# (single-stage direct-to-N, eps loss, 600 steps — `cli distill`
# defaults), against same-checkpoint DDIM baselines at every N, then fit
# the variance calibration (VERDICT r4 #3) on VAL clips and re-evaluate
# each student calibrated.
#
# Usage: round5_sweep.sh <teacher_ckpt_dir>
set -e
cd /root/repo
TEACHER=${1:?teacher ckpt dir}
TEST=runs/r5/split/test
VAL=runs/r5/split/val
PACK=runs/r5/pack_train
OUT=runs/r5
LOG=runs/r5/distill_sweep.log

run() { echo "=== $* ===" | tee -a $LOG; "$@" 2>&1 | tee -a $LOG; }

# ---- baselines on the teacher (the gate rows) ----
run python scripts/ddim_baseline_row.py "$TEACHER" $TEST 6 1000 2.1 ddpm
run python scripts/ddim_baseline_row.py "$TEACHER" $TEST 6 100 2.1 ddim
for N in 50 25 12 8; do
  run python scripts/ddim_baseline_row.py "$TEACHER" $TEST 6 $N 2.1 ddim
done

# ---- direct-to-N students (round-4 winning recipe = CLI defaults) ----
for N in 50 25 12 8; do
  run python -m lm2a_tpu.cli distill --teacher "$TEACHER" --npz_dir $PACK \
      --save_dir $OUT/distill_$N --student_steps $N \
      --steps_per_stage 600 --steps_per_call 25 --batch_size 16 \
      --save_interval 600
  run python scripts/eval_distilled.py $OUT/distill_$N/ckpt_step_600 $TEST 6
done

# ---- variance calibration (fit on VAL, never the test protocol) ----
for N in 50 25 12 8; do
  run python scripts/calibrate_student_std.py $OUT/distill_$N/ckpt_step_600 $VAL 12
  run python scripts/eval_distilled.py $OUT/distill_$N/ckpt_step_600 $TEST 6
done

echo "=== sweep done; table rows in $LOG ==="
