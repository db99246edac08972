#!/usr/bin/env python
"""Localize granular's long-horizon rollout drift (VERDICT r3 weak #6 /
next #5): valid loss improved 63x after the round-3 physics fix, but the
rollout median@last-step (0.278) stayed above rope's and above the 0.216
round-1 figure. This sweeps the rollout-time graph configuration around the
trained one (reference envelope: config/dynamics/granular.yaml
adj_radius_range / topk) and dumps per-push error curves, printing one JSON
row per variant plus a summary verdict line.

Run AFTER the campaign's granular train (reads runs/granular/checkpoints).
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adaptigraph_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from adaptigraph_tpu.cli import _dyn_objects
from adaptigraph_tpu.dynamics.rollout import rollout_dataset
from adaptigraph_tpu.utils.checkpoint import load_checkpoint
from adaptigraph_tpu.utils.config import load_dynamics_config


def main():
    config = load_dynamics_config("granular")
    spec, gnn_cfg, edge_cfg, _ = _dyn_objects(config)
    dc = config["dataset_config"]
    prep_dir = os.path.join(dc["prep_data_dir"], dc["data_name"])
    params = load_checkpoint("runs/granular")

    # variants: trained band center, band edges, denser/sparser graphs
    base_adj = tuple(spec.adj_radius_range)
    variants = [
        ("trained", base_adj, spec.topk),
        ("adj_lo", (base_adj[0], base_adj[0]), spec.topk),
        ("adj_hi", (base_adj[1], base_adj[1]), spec.topk),
        ("adj_wide", (base_adj[0] - 0.02, base_adj[1] + 0.02), spec.topk),
        ("topk_10", base_adj, 10),
        ("topk_30", base_adj, 30),
    ]
    rows = []
    for name, adj, topk in variants:
        sp = dataclasses.replace(spec, adj_radius_range=adj, topk=topk)
        ec = dataclasses.replace(edge_cfg, topk=topk)
        out_dir = f"runs/granular/diag_{name}"
        stats = rollout_dataset(params, sp, gnn_cfg, ec, prep_dir,
                                out_dir=out_dir, save_video=(name == "trained"))
        med = stats["median"]
        per_push = stats.get("per_push", [])
        row = {
            "variant": name, "adj": list(adj), "topk": topk,
            "n_pushes": len(per_push),
            "median_last": round(float(med[-1]), 4) if len(med) else None,
            "median_mean": round(float(np.mean(med)), 4) if len(med) else None,
            "push_final_median": (round(float(np.median(
                [e[-1] for e in per_push if len(e)])), 4) if per_push else None),
            "worst_push_final": (round(float(max(
                e[-1] for e in per_push if len(e))), 4) if per_push else None),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    best = min((r for r in rows if r["median_last"] is not None),
               key=lambda r: r["median_last"])
    print(json.dumps({"summary": "granular_drift_sweep", "best": best,
                      "target_clearly_below": 0.216,
                      "ok": best["median_last"] < 0.216}), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)  # skip axon-tunnel teardown (see bench.py)
