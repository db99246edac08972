#!/bin/bash
# Round-5 data pipeline, REORDERED after the cloth discovery (~95 s/episode,
# 2.6 h for 100): small experiment-critical sets first, cloth resumed where
# the first pipeline stopped (episode 24), extensions last. Replaces
# gen_r5.sh stages 2-6 (stage 1 rope/granular already complete).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/logs data/sim data/prep
LOG=runs/logs/gen_r5.log
note() { echo "[gen_r5b $(date +%T)] $*" | tee -a "$LOG"; }

# Stage A: fresh 20-episode test sets for rope + granular (fast)
for m in rope granular; do
  if [ ! -d "data/prep/${m}_fresh" ]; then
    note "datagen ${m}_fresh"
    python -m adaptigraph_tpu datagen --config "$m" \
      --data_dir "data/sim/${m}_fresh" --n_episodes 20 --n_workers 2 \
      --seed 777 >>"$LOG" 2>&1 || note "datagen ${m}_fresh FAILED"
    python -m adaptigraph_tpu preprocess --config "$m" \
      --data_dir "data/sim/${m}_fresh" --prep_dir "data/prep/${m}_fresh" \
      >>"$LOG" 2>&1 || note "preprocess ${m}_fresh FAILED"
  fi
done

# Stage B: rope_robot 100 + fresh set (data-scaling baseline arm)
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

# Stage C: resume cloth from episode 24 (the slow set; ~95 s/episode)
note "datagen cloth resume 24->100"
python -m adaptigraph_tpu datagen --config cloth --n_workers 2 --seed 42 \
  --start_episode 24 --n_episodes 76 >>"$LOG" 2>&1 \
  || note "cloth resume FAILED"
python -m adaptigraph_tpu preprocess --config cloth >>"$LOG" 2>&1 \
  || note "preprocess cloth FAILED"
note "datagen cloth_fresh"
python -m adaptigraph_tpu datagen --config cloth \
  --data_dir data/sim/cloth_fresh --n_episodes 10 --n_workers 2 --seed 777 \
  >>"$LOG" 2>&1 || note "cloth_fresh FAILED"
python -m adaptigraph_tpu preprocess --config cloth \
  --data_dir data/sim/cloth_fresh --prep_dir data/prep/cloth_fresh \
  >>"$LOG" 2>&1 || note "preprocess cloth_fresh FAILED"

# Stage D: data-scaling extension — rope_robot 100 -> 300
note "datagen rope_robot extend 100->300"
python -m adaptigraph_tpu datagen --config rope --data_dir data/sim/rope_robot \
  --robot --n_workers 2 --seed 43 --start_episode 100 --n_episodes 200 \
  >>"$LOG" 2>&1 || note "rope_robot extend FAILED"
python -m adaptigraph_tpu preprocess --config rope \
  --data_dir data/sim/rope_robot --prep_dir data/prep/rope_robot300 \
  >>"$LOG" 2>&1 || note "preprocess rope_robot300 FAILED"

# Stage E: remaining materials
for m in multiobj bunnybath softbody; do
  note "datagen $m"
  python -m adaptigraph_tpu datagen --config "$m" --n_workers 2 --seed 42 \
    >>"$LOG" 2>&1 || note "datagen $m FAILED"
  python -m adaptigraph_tpu preprocess --config "$m" >>"$LOG" 2>&1 \
    || note "preprocess $m FAILED"
done

# Stage F: rope 100 -> 300 (only reached if everything else landed)
note "datagen rope extend 100->300"
python -m adaptigraph_tpu datagen --config rope --n_workers 2 --seed 42 \
  --start_episode 100 --n_episodes 200 >>"$LOG" 2>&1 \
  || note "rope extend FAILED"
python -m adaptigraph_tpu preprocess --config rope \
  --prep_dir data/prep/rope300 >>"$LOG" 2>&1 || note "preprocess rope300 FAILED"

note "gen_r5b done"
