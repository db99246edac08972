#!/usr/bin/env python
"""Per-push model-vs-reality diagnosis for a recorded closed-loop run
(VERDICT r4 next #3: the cloth loop regresses — is the model's prediction
wrong, or does the executed primitive not realize the prediction?).

Reads step_*.npz (which since round 5 always carry pred_state/pred_error)
and reports per push:
  - error / pred_error: realized vs predicted distance-to-target
  - predicted_change / realized_change: Chamfer(state, pred) vs
    Chamfer(state, state_next) — did the primitive move the object as much
    as the model thought?
  - pred_vs_real: Chamfer(pred_state, state_next) — prediction accuracy in
    state space, independent of the target.

Usage: python scripts/diag_plan_steps.py --save_dir runs/cloth/ab_seed0
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _chamfer_np(a, b):
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    return float(d.min(1).mean() + d.min(0).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save_dir", required=True)
    args = ap.parse_args()

    steps = sorted(glob.glob(os.path.join(args.save_dir, "step_*.npz")))
    if not steps:
        raise SystemExit(f"no step_*.npz under {args.save_dir}")
    init = None
    ifile = os.path.join(args.save_dir, "initial.npz")
    if os.path.exists(ifile):
        init = float(np.load(ifile)["error"])
    rows = []
    for i, f in enumerate(steps):
        d = np.load(f)
        row = {"step": i, "error": round(float(d["error"]), 4)}
        if "pred_error" in d.files:
            row["pred_error"] = round(float(d["pred_error"]), 4)
        if "pred_state" in d.files and "state" in d.files:
            state, pred = d["state"], d["pred_state"]
            nxt = d["state_next"]
            n = min(len(state), len(pred), len(nxt))
            row["predicted_change"] = round(_chamfer_np(state[:n], pred[:n]), 4)
            row["realized_change"] = round(_chamfer_np(state[:n], nxt[:n]), 4)
            row["pred_vs_real"] = round(_chamfer_np(pred[:n], nxt[:n]), 4)
        rows.append(row)
        print(json.dumps(row))
    errs = [r["error"] for r in rows]
    summary = {
        "stage": "plan_steps_diag", "save_dir": args.save_dir,
        "initial_error": init, "final_error": errs[-1], "best": min(errs),
        "n_worse_than_initial": (sum(1 for e in errs if init and e > init)
                                 if init else None),
        "mean_pred_vs_real": (round(float(np.mean(
            [r["pred_vs_real"] for r in rows if "pred_vs_real" in r])), 4)
            if any("pred_vs_real" in r for r in rows) else None),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
