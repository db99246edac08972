#!/usr/bin/env python
"""Granular-quality diagnosis, data side (VERDICT r2 weak #3).

Computes reference-free baselines on the prepared dataset to localize the
0.028 valid-loss plateau:
  - zero-motion baseline: the multi-step MSE of predicting "nothing moves"
    (the floor any useful model must beat by a wide margin);
  - per-step displacement stats of FPS'd object particles between paired
    frames (is the motion smooth or choppy?);
  - fraction of motion energy in particles NEAR the pusher vs far away
    (XPBD grain chatter far from the tool is unlearnable noise).
Prints JSON lines per material given on argv (default granular + rope for
contrast).
"""

import json
import sys

import numpy as np

from adaptigraph_tpu.dynamics.dataset import DynDataset
from adaptigraph_tpu.dynamics.graphs import GraphSpec
from adaptigraph_tpu.ops.fps import fps_downsample

SPECS = {
    "granular": GraphSpec(n_his=4, n_future=3, max_nobj=100, max_neef=5,
                          fps_radius_range=(0.18, 0.22),
                          adj_radius_range=(0.38, 0.42), topk=20),
    "rope": GraphSpec(n_his=4, n_future=3, max_nobj=100, max_neef=1,
                      fps_radius_range=(0.18, 0.22),
                      adj_radius_range=(0.48, 0.52), topk=10),
}


def analyze(material):
    spec = SPECS[material]
    ds = DynDataset(f"data/prep/{material}", spec, phase="train",
                    ratio={"train": [0, 0.98], "valid": [0.98, 1]})
    rng = np.random.RandomState(0)
    n_his, n_future = spec.n_his, spec.n_future

    zero_motion_mse = []   # per future step: mean((next - cur)^2)
    step_disp = []         # per-particle displacement norms between frames
    near_energy, far_energy = [], []
    n_samples = min(400, len(ds.index))
    for si in rng.choice(len(ds.index), n_samples, replace=False):
        ei, pi = ds.index[si]
        epi = ds._episode(ei)
        pair = list(epi["pairs"][pi])
        obj, eef = epi["obj_pos"], epi["eef_pos"]
        cur_f = pair[n_his - 1]
        idx = fps_downsample(obj[cur_f], spec.max_nobj,
                             float(np.mean(spec.fps_radius_range)), rng=rng)
        cur = obj[cur_f][idx]
        mse = 0.0
        for fi in range(n_future):
            nxt = obj[pair[n_his + fi]][idx]
            mse += float(np.mean((nxt - cur) ** 2))
            d = np.linalg.norm(nxt - cur, axis=-1)
            step_disp.extend(np.linalg.norm(
                obj[pair[n_his + fi]][idx]
                - obj[pair[n_his + fi - 1]][idx], axis=-1))
            # near = within 2 adj radii of any eef keypoint at the current frame
            eef_cur = eef[cur_f]
            dist_tool = np.min(np.linalg.norm(
                cur[:, None] - eef_cur[None], axis=-1), axis=1)
            near = dist_tool < 2 * float(np.mean(spec.adj_radius_range))
            near_energy.append(float(np.sum(d[near] ** 2)))
            far_energy.append(float(np.sum(d[~near] ** 2)))
            cur = nxt  # zero-motion predicts the PREVIOUS frame each step
        zero_motion_mse.append(mse)

    disp = np.asarray(step_disp)
    out = {
        "material": material,
        "n_samples": n_samples,
        "zero_motion_loss": round(float(np.mean(zero_motion_mse)), 5),
        "disp_median": round(float(np.median(disp)), 5),
        "disp_p90": round(float(np.percentile(disp, 90)), 5),
        "disp_max": round(float(np.max(disp)), 4),
        "frac_moving_gt_0.02": round(float(np.mean(disp > 0.02)), 4),
        "near_energy_frac": round(float(np.sum(near_energy)
                                        / max(np.sum(near_energy) + np.sum(far_energy), 1e-9)), 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    mats = sys.argv[1:] or ["granular", "rope"]
    for m in mats:
        analyze(m)
