#!/bin/bash
# Round-5 data pipeline, priority-ordered so experiment-critical sets land
# first (VERDICT r4 next #1/#3/#5): flagship train sets -> fresh test sets ->
# rope_robot 100 -> data-scaling extensions (300 eps) -> remaining materials.
# Each stage logs to runs/logs/gen_r5.log; stage completion is visible from
# the prep dirs (campaign.wait_for_prep polls those).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs data/sim data/prep
LOG=runs/logs/gen_r5.log
note() { echo "[gen_r5 $(date +%T)] $*" | tee -a "$LOG"; }

# Stage 1: flagship train sets (rope/granular/cloth, 100 eps, seed 42)
for m in rope granular cloth; do
  note "datagen $m"
  python -m adaptigraph_tpu datagen --config "$m" --n_workers 2 --seed 42 \
    >>"$LOG" 2>&1 || note "datagen $m FAILED"
  note "preprocess $m"
  python -m adaptigraph_tpu preprocess --config "$m" >>"$LOG" 2>&1 \
    || note "preprocess $m FAILED"
done

# Stage 2: fresh 20-episode held-out test sets (seed 777; r4 protocol)
for m in rope granular cloth; do
  note "datagen ${m}_fresh"
  python -m adaptigraph_tpu datagen --config "$m" \
    --data_dir "data/sim/${m}_fresh" --n_episodes 20 --n_workers 2 \
    --seed 777 >>"$LOG" 2>&1 || note "datagen ${m}_fresh FAILED"
  python -m adaptigraph_tpu preprocess --config "$m" \
    --data_dir "data/sim/${m}_fresh" --prep_dir "data/prep/${m}_fresh" \
    >>"$LOG" 2>&1 || note "preprocess ${m}_fresh FAILED"
done

# Stage 3: rope_robot 100 + its fresh set (train can start on the 100)
note "datagen rope_robot (100)"
python -m adaptigraph_tpu datagen --config rope --data_dir data/sim/rope_robot \
  --robot --n_workers 2 --seed 43 >>"$LOG" 2>&1 || note "rope_robot FAILED"
python -m adaptigraph_tpu preprocess --config rope \
  --data_dir data/sim/rope_robot --prep_dir data/prep/rope_robot \
  >>"$LOG" 2>&1 || note "preprocess rope_robot FAILED"
note "datagen rope_robot_fresh"
python -m adaptigraph_tpu datagen --config rope \
  --data_dir data/sim/rope_robot_fresh --robot --n_episodes 20 --n_workers 2 \
  --seed 778 >>"$LOG" 2>&1 || note "rope_robot_fresh FAILED"
python -m adaptigraph_tpu preprocess --config rope \
  --data_dir data/sim/rope_robot_fresh --prep_dir data/prep/rope_robot_fresh \
  >>"$LOG" 2>&1 || note "preprocess rope_robot_fresh FAILED"

# Stage 4: data scaling (VERDICT #5) — extend rope_robot to 300 episodes
note "datagen rope_robot extend 100->300"
python -m adaptigraph_tpu datagen --config rope --data_dir data/sim/rope_robot \
  --robot --n_workers 2 --seed 43 --start_episode 100 --n_episodes 200 \
  >>"$LOG" 2>&1 || note "rope_robot extend FAILED"
python -m adaptigraph_tpu preprocess --config rope \
  --data_dir data/sim/rope_robot --prep_dir data/prep/rope_robot300 \
  >>"$LOG" 2>&1 || note "preprocess rope_robot300 FAILED"

# Stage 5: extend rope to 300 episodes -> prep/rope300
note "datagen rope extend 100->300"
python -m adaptigraph_tpu datagen --config rope --n_workers 2 --seed 42 \
  --start_episode 100 --n_episodes 200 >>"$LOG" 2>&1 \
  || note "rope extend FAILED"
python -m adaptigraph_tpu preprocess --config rope \
  --prep_dir data/prep/rope300 >>"$LOG" 2>&1 \
  || note "preprocess rope300 FAILED"

# Stage 6: remaining materials for the full matrix
for m in multiobj bunnybath softbody; do
  note "datagen $m"
  python -m adaptigraph_tpu datagen --config "$m" --n_workers 2 --seed 42 \
    >>"$LOG" 2>&1 || note "datagen $m FAILED"
  python -m adaptigraph_tpu preprocess --config "$m" >>"$LOG" 2>&1 \
    || note "preprocess $m FAILED"
done

note "gen_r5 done"
