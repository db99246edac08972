#!/usr/bin/env python
"""Record the granular PPO demo fixture (VERDICT r4 next #8 / missing #4).

The reference's only shipped adaptation demo is GRANULAR
(demo_granular_1.py:48-51, expected estimate ~0.04 for its recorded
interactions); the repo's committed fixture was rope. This script records
the granular equivalent against the trained granular model:

  1. builds a granular SimRealEnv scene and notes its TRUE normalized
     granular_scale (the sampled property the model is conditioned on)
  2. executes N excitation pushes, recording interaction_*.npz exactly as
     the closed loop does
  3. copies the trained checkpoint next to them (fixtures/granular_demo)
  4. replays the fixture through PhysicsParamOnlineOptimizer and reports
     estimate vs truth as one JSON line (done bar: |est - truth| <= 0.02,
     or an honest miss recorded for diagnosis)

Run AFTER runs/granular/checkpoints/latest.npz exists.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptigraph_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default="runs/granular")
    ap.add_argument("--out_dir", default="fixtures/granular_demo")
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--n_pushes", type=int, default=5)
    ap.add_argument("--iterations", type=int, default=50)
    args = ap.parse_args()

    from adaptigraph_tpu.cli import _phys_specs, _task_objects
    from adaptigraph_tpu.planning.closed_loop import sim_action_to_board
    from adaptigraph_tpu.planning.physics_optimizer import \
        PhysicsParamOnlineOptimizer
    from adaptigraph_tpu.realworld.env import SimRealEnv
    from adaptigraph_tpu.realworld.perception import (PerceptionModule,
                                                      get_state_cur)
    from adaptigraph_tpu.utils.checkpoint import load_checkpoint
    from adaptigraph_tpu.utils.config import load_planning_config

    task = load_planning_config("granular")
    tcfg, config = _task_objects(task)
    params = load_checkpoint(args.ckpt_dir)

    env = SimRealEnv("granular", seed=args.seed,
                     sim_real_ratio=tcfg.sim_real_ratio)
    props = env.env.properties
    truth = np.array(
        [(float(props[s["name"]]) - s["min"]) / (s["max"] - s["min"])
         for s in _phys_specs(config) if s["use"]], np.float32)

    os.makedirs(args.out_dir, exist_ok=True)
    for f in os.listdir(args.out_dir):
        if f.startswith("interaction_"):
            os.remove(os.path.join(args.out_dir, f))
    ppo = PhysicsParamOnlineOptimizer(
        tcfg.dcfg, params, phys_dim=tcfg.dcfg.gnn.phys_dim,
        save_dir=args.out_dir, seed=args.seed)
    pm = PerceptionModule(stride=2)
    rng = np.random.RandomState(args.seed)

    def perceive():
        st, _ = get_state_cur(env, pm, fps_radius=tcfg.fps_radius,
                              sim_real_ratio=tcfg.sim_real_ratio,
                              max_nobj=tcfg.dcfg.gnn.max_nobj,
                              use_raw=tcfg.use_raw, rng=rng)
        return st

    state0 = perceive()
    np.savez(os.path.join(args.out_dir, "initial.npz"),
             error=np.nan, state=state0, true_phys=truth)
    for i in range(args.n_pushes):
        st = perceive()
        act = rng.uniform(np.asarray(tcfg.action_lower_lim),
                          np.asarray(tcfg.action_upper_lim)).astype(np.float32)
        env.step(sim_action_to_board(act, tcfg.sim_real_ratio))
        st_next = perceive()
        ppo.add_interaction(act, st, st, st_next)

    ckdir = os.path.join(args.out_dir, "checkpoints")
    os.makedirs(ckdir, exist_ok=True)
    shutil.copy(os.path.join(args.ckpt_dir, "checkpoints", "latest.npz"),
                os.path.join(ckdir, "latest.npz"))

    est, err, err0 = ppo.optimize(iterations=args.iterations)
    row = {"stage": "granular_fixture", "true_phys": [float(x) for x in truth],
           "estimate": [float(x) for x in est],
           "abs_error": float(np.abs(est - truth).max()),
           "fit_error": err, "fit_error_init": err0,
           "n_interactions": args.n_pushes, "seed": args.seed,
           "within_0.02": bool(np.abs(est - truth).max() <= 0.02)}
    with open(os.path.join(args.out_dir, "expected.json"), "w") as f:
        json.dump(row, f, indent=1)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)  # skip axon-tunnel teardown (see bench.py)
