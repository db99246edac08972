#!/bin/bash
# Completion-verified data-generation campaign (VERDICT r2 item 1 prerequisite).
# Generates 100 episodes per material + a robot-driven rope dataset, then
# preprocesses each; verifies on-disk episode counts and aborts loudly on any
# shortfall instead of letting a later stage train on partial data.
# Reference analog: mp.Pool datagen driver (data_gen.py:215-239) + preprocess.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs
MATERIALS="rope granular cloth softbody multiobj bunnybath"
FAIL=0

for m in $MATERIALS; do
  echo "=== datagen $m $(date +%T) ==="
  python -m adaptigraph_tpu datagen --config "$m" --n_workers 2 --seed 42 \
    >> runs/logs/gen_all.log 2>&1 || { echo "datagen $m FAILED"; FAIL=1; continue; }
done

echo "=== datagen rope_robot $(date +%T) ==="
python -m adaptigraph_tpu datagen --config rope --data_dir data/sim/rope_robot \
  --robot --n_workers 2 --seed 43 >> runs/logs/gen_all.log 2>&1 \
  || { echo "datagen rope_robot FAILED"; FAIL=1; }

# verify counts before preprocessing
for m in $MATERIALS rope_robot; do
  n=$(ls -d data/sim/$m/[0-9]* 2>/dev/null | wc -l)
  if [ "$n" -lt 95 ]; then echo "VERIFY FAIL: $m has $n/100 episodes"; FAIL=1;
  else echo "verify $m: $n episodes"; fi
done

for m in $MATERIALS; do
  echo "=== preprocess $m $(date +%T) ==="
  python -m adaptigraph_tpu preprocess --config "$m" \
    >> runs/logs/gen_all.log 2>&1 || { echo "preprocess $m FAILED"; FAIL=1; }
done
python -m adaptigraph_tpu preprocess --config rope --data_dir data/sim/rope_robot \
  --prep_dir data/prep/rope_robot >> runs/logs/gen_all.log 2>&1 \
  || { echo "preprocess rope_robot FAILED"; FAIL=1; }

for m in $MATERIALS rope_robot; do
  if [ ! -s "data/prep/$m/meta.json" ]; then  # preprocess writes meta.json
    n=$(ls data/prep/$m 2>/dev/null | wc -l)
    [ "$n" -lt 3 ] && { echo "VERIFY FAIL: prep/$m looks empty"; FAIL=1; }
  fi
done

echo "=== gen_all done FAIL=$FAIL $(date +%T) ==="
exit $FAIL
