#!/usr/bin/env python
"""Two-level cloth closed-loop diagnosis (round 5, VERDICT r4 next #3).

Level 1 (diag_plan_steps on perceived states) suggested the executed
grasp moves the cloth ~2.4x more than the model predicts. This script is
level 2, which overturned that:

  a. TRUE-state replay — re-execute the recorded warmup + plan actions
     of a saved run in a fresh sim with the same seed and measure actual
     particle displacement (valid correspondences, no perception in the
     loop). Finding: true mean displacement ~0.16 vs model-predicted
     ~0.19 — the dynamics model is fine.
  b. Perception noise floor — perceive the SAME unchanged scene twice
     and measure the chamfer between the two perceived clouds, across
     FPS radii. Finding: cloth (a flat sheet, worst case for the
     45-degree depth-splat cameras) floors at ~0.24-0.31 vs rope 0.088;
     per-push target improvements (~0.02-0.05) sit UNDER the floor, so
     the loop orbits near its floor.

Usage: python scripts/diag_cloth_perception.py \
           [--save_dir runs/cloth/ab_seed0] [--seed 0]
Prints one JSON line; optionally --out for the artifact copy.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chamfer_np(a, b):
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    return float(d.min(1).mean() + d.min(0).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save_dir", default="runs/cloth/ab_seed0")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out")
    args = ap.parse_args()

    from adaptigraph_tpu.cli import _task_objects
    from adaptigraph_tpu.planning.closed_loop import sim_action_to_board
    from adaptigraph_tpu.realworld.env import SimRealEnv
    from adaptigraph_tpu.realworld.perception import (PerceptionModule,
                                                      get_state_cur)
    from adaptigraph_tpu.utils.config import load_planning_config

    tcfg, _ = _task_objects(load_planning_config("cloth"))
    row = {"stage": "cloth_perception_diag", "save_dir": args.save_dir,
           "seed": args.seed}

    # a. true-state replay of the recorded run
    replay = []
    inter = sorted(glob.glob(os.path.join(args.save_dir, "interaction_*.npz")))
    steps = sorted(glob.glob(os.path.join(args.save_dir, "step_*.npz")))
    if steps:
        env = SimRealEnv("cloth", seed=args.seed,
                         sim_real_ratio=tcfg.sim_real_ratio)
        # the first 3 interactions are the warmup pushes executed before
        # step 0 (closed_loop.py warmup); replay them to reach step-0 state
        for f in inter[:3]:
            env.step_gripper(sim_action_to_board(np.load(f)["act"],
                                                 tcfg.sim_real_ratio))
        for f in steps[:5]:
            d = np.load(f)
            a = d["act"][0] if d["act"].ndim == 2 else d["act"]
            p0 = env.get_particles_sim()
            env.step_gripper(sim_action_to_board(a, tcfg.sim_real_ratio))
            p1 = env.get_particles_sim()
            disp = np.linalg.norm(p1 - p0, axis=-1)
            rec = {"true_mean_disp": round(float(disp.mean()), 3),
                   "true_top10_disp": round(
                       float(np.sort(disp)[-max(1, len(disp) // 10):].mean()), 3)}
            if "pred_state" in d.files:
                st, pr = d["state"], d["pred_state"]
                n = min(len(st), len(pr))
                rec["model_pred_change_chamfer"] = round(
                    chamfer_np(st[:n], pr[:n]), 3)
            replay.append(rec)
        row["replay_steps"] = replay

    # b. no-op perception chamfer floor across radii, cloth vs rope
    pm = PerceptionModule(stride=2)
    rng = np.random.RandomState(args.seed)
    floors = {}
    env2 = SimRealEnv("cloth", seed=args.seed,
                      sim_real_ratio=tcfg.sim_real_ratio)
    for r in (0.30, 0.15, 0.10):
        s1 = get_state_cur(env2, pm, fps_radius=r, sim_real_ratio=10.0,
                           max_nobj=tcfg.dcfg.gnn.max_nobj,
                           use_raw=tcfg.use_raw, rng=rng)[0]
        s2 = get_state_cur(env2, pm, fps_radius=r, sim_real_ratio=10.0,
                           max_nobj=tcfg.dcfg.gnn.max_nobj,
                           use_raw=tcfg.use_raw, rng=rng)[0]
        floors[str(r)] = {"n_pts": len(s1),
                          "noop_chamfer": round(chamfer_np(s1, s2), 3)}
    row["cloth_noop_floor"] = floors
    tr, _ = _task_objects(load_planning_config("rope"))
    envr = SimRealEnv("rope", seed=args.seed, sim_real_ratio=10.0)
    r1 = get_state_cur(envr, pm, fps_radius=tr.fps_radius, sim_real_ratio=10.0,
                       max_nobj=tr.dcfg.gnn.max_nobj, use_raw=tr.use_raw,
                       rng=rng)[0]
    r2 = get_state_cur(envr, pm, fps_radius=tr.fps_radius, sim_real_ratio=10.0,
                       max_nobj=tr.dcfg.gnn.max_nobj, use_raw=tr.use_raw,
                       rng=rng)[0]
    row["rope_noop_floor"] = round(chamfer_np(r1, r2), 3)

    out = json.dumps(row)
    print(out, flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
