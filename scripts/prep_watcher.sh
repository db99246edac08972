#!/bin/bash
# Preprocess each material as soon as its datagen completes (100 episodes),
# so the training campaign never stalls waiting on gen_all's final prep pass.
set -u
cd "$(dirname "$0")/.."
# rope included: on a clean checkout nothing else preprocesses it before the
# campaign's first (flagship) train needs it
PENDING="rope granular cloth softbody multiobj bunnybath"
for i in $(seq 1 200); do
  left=""
  for m in $PENDING; do
    n=$(ls -d data/sim/$m/[0-9]* 2>/dev/null | wc -l)
    if [ "$n" -ge 100 ] && [ ! -e "data/prep/$m/.done" ]; then
      echo "prep $m ($(date +%T))"
      nice -n 10 python -m adaptigraph_tpu preprocess --config "$m" \
        >> runs/logs/gen_all.log 2>&1 && touch "data/prep/$m/.done" || left="$left $m"
    elif [ ! -e "data/prep/$m/.done" ]; then
      left="$left $m"
    fi
  done
  # rope_robot last (generated after the six materials)
  n=$(ls -d data/sim/rope_robot/[0-9]* 2>/dev/null | wc -l)
  if [ "$n" -ge 100 ] && [ ! -e "data/prep/rope_robot/.done" ]; then
    echo "prep rope_robot ($(date +%T))"
    nice -n 10 python -m adaptigraph_tpu preprocess --config rope \
      --data_dir data/sim/rope_robot --prep_dir data/prep/rope_robot \
      >> runs/logs/gen_all.log 2>&1 && touch "data/prep/rope_robot/.done"
  fi
  if [ -z "$left" ] && [ -e "data/prep/rope_robot/.done" ]; then
    echo "prep_watcher: all done"; exit 0
  fi
  sleep 60
done
