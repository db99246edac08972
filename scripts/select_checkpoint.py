#!/usr/bin/env python
"""Select the best checkpoint by FRESH-set rollout or a PLANNING proxy.

Round-4 finding (artifacts/r4/rope_loop_analysis.md): rope_robot's valid
loss kept improving to 8.7e-5 while generalization to new robot episodes
collapsed (0.159 at epoch 30 → 0.356 at epoch 50). Same-dataset holdouts
cannot see this; a fresh-episode set can.

Round-4 ALSO falsified fresh-set rollout as a planning predictor three
times (commits 517fad4/116fa55/5b79875: ep-30 rope rolls out better but
PLANS worse than ep-50). ``--proxy miniplan`` therefore scores each
checkpoint by what the planner actually experiences: K short closed-loop
plans on fresh SimRealEnv scenes (fixed seeds, modest sample budget, PPO
off), ranked by mean final error. Reference intent: rollout eval exists
to pick models for planning (rollout.py:438-467).

Usage:
    python scripts/select_checkpoint.py --config rope --out_dir runs/rope_robot \
        --prep_dir data/prep/rope_robot_fresh            # rollout mode
    python scripts/select_checkpoint.py --config rope --out_dir runs/rope \
        --proxy miniplan --plan_config rope --seeds 21 22 23   # planning mode

Prints one JSON row per epoch plus a summary, and writes
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


def eval_rollout(args, ckpts):
    from adaptigraph_tpu.cli import _dyn_objects
    from adaptigraph_tpu.dynamics.rollout import rollout_dataset
    from adaptigraph_tpu.utils.checkpoint import load_checkpoint
    from adaptigraph_tpu.utils.config import load_dynamics_config

    config = load_dynamics_config(args.config)
    spec, gnn_cfg, edge_cfg, _ = _dyn_objects(config)
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
    return rows


def eval_miniplan(args, ckpts):
    """Planning-outcome proxy: K short closed-loop plans per checkpoint on
    fresh SimRealEnv scenes. One compiled solve program serves every
    checkpoint (params are inputs), so cost is K x n_actions solves each."""
    import dataclasses

    from adaptigraph_tpu.cli import _task_objects
    from adaptigraph_tpu.planning.closed_loop import run_plan
    from adaptigraph_tpu.realworld.env import SimRealEnv
    from adaptigraph_tpu.utils.checkpoint import load_checkpoint
    from adaptigraph_tpu.utils.config import load_planning_config

    task = load_planning_config(args.plan_config or args.config)
    tcfg, config = _task_objects(task)
    tcfg.mcfg = dataclasses.replace(tcfg.mcfg, n_sample=args.n_sample,
                                    n_sample_chunk=min(args.n_sample, 2000))
    tcfg.n_actions = args.n_actions
    material = config["dataset_config"]["materials"][0]
    M = tcfg.dcfg.gnn.max_nobj

    rows = []
    for p in ckpts:
        epoch = int(re.search(r"model_(\d+)", p).group(1))
        params = load_checkpoint(args.out_dir, epoch=epoch)
        finals, bests, inits = [], [], []
        for seed in args.seeds:
            env = SimRealEnv(material, seed=seed,
                             sim_real_ratio=tcfg.sim_real_ratio)
            target = env.get_particles_sim() + np.array(
                [0.5, 0.0, 0.3], np.float32)
            idx = np.random.RandomState(seed).choice(
                len(target), M, replace=len(target) < M)
            hist = run_plan(env, params, tcfg, target[idx], save_dir=None,
                            seed=seed, use_ppo=False, verbose=False)
            if not hist["errors"]:
                continue
            inits.append(hist["initial_error"])
            finals.append(hist["errors"][-1])
            bests.append(min(hist["errors"]))
        row = {
            "epoch": epoch, "n_plans": len(finals),
            "plan_final": round(float(np.mean(finals)), 5) if finals else None,
            "plan_best": round(float(np.mean(bests)), 5) if bests else None,
            "plan_initial": round(float(np.mean(inits)), 5) if inits else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--prep_dir",
                    help="FRESH-episode prep dir (rollout proxy)")
    ap.add_argument("--proxy", default="rollout",
                    choices=["rollout", "miniplan"])
    ap.add_argument("--metric", default=None,
                    help="ranking key (default: median_last for rollout, "
                         "plan_final for miniplan)")
    ap.add_argument("--plan_config", help="planning yaml for --proxy miniplan "
                                          "(defaults to --config)")
    ap.add_argument("--seeds", type=int, nargs="+", default=[21, 22, 23])
    ap.add_argument("--n_sample", type=int, default=2000)
    ap.add_argument("--n_actions", type=int, default=3)
    ap.add_argument("--epochs", type=int, nargs="+",
                    help="restrict to these checkpoint epochs")
    args = ap.parse_args()

    ckpts = sorted(
        glob.glob(os.path.join(args.out_dir, "checkpoints", "model_*.npz")),
        key=lambda p: int(re.search(r"model_(\d+)", p).group(1)))
    if args.epochs:
        ckpts = [p for p in ckpts
                 if int(re.search(r"model_(\d+)", p).group(1)) in args.epochs]
    if not ckpts:
        raise SystemExit(f"no model_*.npz under {args.out_dir}/checkpoints")

    if args.proxy == "miniplan":
        rows = eval_miniplan(args, ckpts)
        metric = args.metric or "plan_final"
    else:
        if not args.prep_dir:
            raise SystemExit("--proxy rollout needs --prep_dir")
        rows = eval_rollout(args, ckpts)
        metric = args.metric or "median_last"
    best = min((r for r in rows if r.get(metric) is not None),
               key=lambda r: r[metric])
    out = {"summary": "select_checkpoint", "proxy": args.proxy,
           "metric": metric, "best_epoch": best["epoch"], "best": best,
           "rows": rows}
    with open(os.path.join(args.out_dir, "checkpoints", "best_epoch.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)  # skip axon-tunnel teardown (see bench.py)
