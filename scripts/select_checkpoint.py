#!/usr/bin/env python
"""Select the best checkpoint by FRESH-set rollout, not train-split loss.

Round-4 finding (artifacts/r4/rope_loop_analysis.md): rope_robot's valid
loss kept improving to 8.7e-5 while generalization to new robot episodes
collapsed (0.159 at epoch 30 → 0.356 at epoch 50). Same-dataset holdouts
cannot see this; a fresh-episode set can.

Usage:
    python scripts/select_checkpoint.py --config rope --out_dir runs/rope_robot \
        --prep_dir data/prep/rope_robot_eval

Evaluates every model_*.npz in <out_dir>/checkpoints on the fresh prep
set, prints one JSON row per epoch plus a summary, and writes
<out_dir>/checkpoints/best_epoch.json recording the winner.
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptigraph_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--prep_dir", required=True,
                    help="FRESH-episode prep dir (never seen in training)")
    ap.add_argument("--metric", default="median_last",
                    choices=["median_last", "push_final"])
    args = ap.parse_args()

    from adaptigraph_tpu.cli import _dyn_objects
    from adaptigraph_tpu.dynamics.rollout import rollout_dataset
    from adaptigraph_tpu.utils.checkpoint import load_checkpoint
    from adaptigraph_tpu.utils.config import load_dynamics_config

    config = load_dynamics_config(args.config)
    spec, gnn_cfg, edge_cfg, _ = _dyn_objects(config)
    ckpts = sorted(
        glob.glob(os.path.join(args.out_dir, "checkpoints", "model_*.npz")),
        key=lambda p: int(re.search(r"model_(\d+)", p).group(1)))
    if not ckpts:
        raise SystemExit(f"no model_*.npz under {args.out_dir}/checkpoints")
    rows = []
    for p in ckpts:
        epoch = int(re.search(r"model_(\d+)", p).group(1))
        params = load_checkpoint(args.out_dir, epoch=epoch)
        stats = rollout_dataset(params, spec, gnn_cfg, edge_cfg, args.prep_dir,
                                phase_ratio=(0.0, 1.0), out_dir=None,
                                save_video=False)
        med, per_push = stats["median"], stats.get("per_push", [])
        row = {
            "epoch": epoch,
            "n_pushes": len(per_push),
            "median_last": round(float(med[-1]), 5) if len(med) else None,
            "push_final": (round(float(np.median(
                [e[-1] for e in per_push if len(e)])), 5) if per_push else None),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    best = min((r for r in rows if r[args.metric] is not None),
               key=lambda r: r[args.metric])
    out = {"summary": "select_checkpoint", "metric": args.metric,
           "best_epoch": best["epoch"], "best": best}
    with open(os.path.join(args.out_dir, "checkpoints", "best_epoch.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)  # skip axon-tunnel teardown (see bench.py)
