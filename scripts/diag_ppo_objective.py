#!/usr/bin/env python
"""Diagnose the online physics-fit objective (VERDICT r4 next #1c).

Round-4 finding: granular in-loop estimates peg at the −0.2 search clamp on
every seed, and rope estimates wander while the objective improves by <1%.
This script makes the objective surface inspectable: given a plan/interact
save_dir (recorded ``interaction_*.npz``) and the model checkpoint, it
sweeps the 1-D normalized parameter over a dense grid with ONE batched
device call per interaction-count prefix and reports

  - the objective curve (param -> mean masked-Chamfer dynamics error)
  - its argmin, the curve's dynamic range (flatness), and
  - the scene's TRUE parameter (from initial.npz, recorded since round 5)

for the full interaction set and for prefixes (how the surface sharpens as
interactions accumulate). Output: one JSON line (plus optional npz curve).

Usage:
    python scripts/diag_ppo_objective.py --config granular \
        --ckpt_dir runs/granular --save_dir runs/granular/ab_ppo_seed0 \
        [--out artifacts/r5/ppo_objective_granular_seed0.npz]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptigraph_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="planning yaml name")
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--epoch", type=int)
    ap.add_argument("--save_dir", required=True,
                    help="dir with interaction_*.npz (+ initial.npz)")
    ap.add_argument("--n_grid", type=int, default=57)
    ap.add_argument("--out", help="npz path for the full curves")
    args = ap.parse_args()

    from adaptigraph_tpu.cli import _task_objects
    from adaptigraph_tpu.planning.physics_optimizer import (
        PARAM_HI, PARAM_LO, PhysicsParamOnlineOptimizer)
    from adaptigraph_tpu.utils.checkpoint import load_checkpoint
    from adaptigraph_tpu.utils.config import load_planning_config

    task = load_planning_config(args.config)
    tcfg, config = _task_objects(task)
    params = load_checkpoint(args.ckpt_dir, epoch=args.epoch)

    ppo = PhysicsParamOnlineOptimizer(
        tcfg.dcfg, params, phys_dim=tcfg.dcfg.gnn.phys_dim, save_dir=None)
    ppo.load_interactions(args.save_dir)
    n_inter = len(ppo._interactions)
    if not n_inter:
        raise SystemExit(f"no interaction_*.npz under {args.save_dir}")

    truth = None
    ifile = os.path.join(args.save_dir, "initial.npz")
    if os.path.exists(ifile):
        d = np.load(ifile)
        if "true_phys" in d.files:
            truth = [float(x) for x in np.atleast_1d(d["true_phys"])]

    grid = np.linspace(PARAM_LO, PARAM_HI, args.n_grid, dtype=np.float32)
    cand = np.repeat(grid[:, None], ppo.phys_dim, axis=1)

    # objective surface for growing interaction prefixes
    all_inter = list(ppo._interactions)
    prefixes = sorted({max(1, n_inter // 4), max(1, n_inter // 2), n_inter})
    curves = {}
    for k in prefixes:
        ppo._interactions = all_inter[:k]
        curves[k] = np.asarray(ppo.evaluate(cand))
    ppo._interactions = all_inter

    full = curves[n_inter]
    argmin = float(grid[int(np.argmin(full))])
    rng_rel = float((full.max() - full.min()) / max(full.min(), 1e-9))
    # curvature proxy at the minimum: how distinguishable is the argmin from
    # the curve's mean level relative to its noise floor
    row = {
        "stage": "ppo_objective", "save_dir": args.save_dir,
        "n_interactions": n_inter, "true_phys": truth,
        "argmin": argmin,
        "obj_at_argmin": float(full.min()),
        "obj_at_truth": (float(np.interp(truth[0], grid, full))
                         if truth else None),
        "obj_at_default": float(np.interp(0.5, grid, full)),
        "relative_range": rng_rel,
        "monotone": bool(np.all(np.diff(full) >= 0)
                         or np.all(np.diff(full) <= 0)),
        "prefix_argmins": {str(k): float(grid[int(np.argmin(c))])
                           for k, c in curves.items()},
    }
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        np.savez(args.out, grid=grid,
                 **{f"curve_{k}": c for k, c in curves.items()},
                 truth=np.asarray(truth if truth else [np.nan]))
        row["curve_npz"] = args.out
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)  # skip axon-tunnel teardown (see bench.py)
