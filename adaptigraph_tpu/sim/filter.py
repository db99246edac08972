"""Sim-data quality filter: flag pushes with simulator artifacts.

Plays the role of the reference's ``filter_sim_data.py``
(reference: ``src/dynamics/preprocess/filter_sim_data.py:46-98``), which
flags a push when the max per-particle displacement of its penultimate frame
from the episode rest state exceeds a threshold (particles stuck to the tool,
solver blow-ups). Output feeds ``preprocess(filter_actions=...)``
(reference: ``preprocess.py:22-41`` filter-file consumption).

Extra gates beyond the reference: NaN/Inf detection and a velocity-spike
check (max single-frame displacement), both cheap and catching the failure
modes a from-scratch XPBD engine can exhibit.
"""

import json
import os

import numpy as np

from adaptigraph_tpu.sim import io as sim_io


def scan_episode(epi_dir, drift_thresh=1.0, spike_thresh=0.5):
    """Flag suspicious pushes of one episode.

    Returns {push_idx: reason} (1-based push indices, matching the
    preprocess filter convention).
    """
    flags = {}
    pushes = sim_io.list_pushes(epi_dir)
    if not pushes:
        return flags
    first = sim_io.load_episode_step(os.path.join(epi_dir, pushes[0]))
    rest = first["positions"][0]
    for idx, push_file in enumerate(pushes, start=1):
        data = sim_io.load_episode_step(os.path.join(epi_dir, push_file))
        pos = data["positions"]
        if not np.isfinite(pos).all():
            flags[idx] = "non-finite positions"
            continue
        # max drift of the penultimate frame from rest (filter_sim_data.py:79)
        if len(pos) >= 2:
            drift = float(np.max(np.abs(pos[-2] - rest)))
            if drift > drift_thresh:
                flags[idx] = f"drift {drift:.3f} > {drift_thresh}"
                continue
        # single-frame velocity spike
        if len(pos) >= 2:
            spike = float(np.max(np.linalg.norm(np.diff(pos, axis=0), axis=-1)))
            if spike > spike_thresh:
                flags[idx] = f"frame-to-frame spike {spike:.3f} > {spike_thresh}"
    return flags


def filter_dataset(data_dir, out_file=None, drift_thresh=1.0, spike_thresh=0.5):
    """Scan all episodes; write a json filter file consumable by
    ``preprocess(filter_actions=...)``. Returns {episode_name: [push_idx]}."""
    result = {}
    for epi in sim_io.list_episodes(data_dir):
        flags = scan_episode(os.path.join(data_dir, epi), drift_thresh,
                             spike_thresh)
        if flags:
            result[epi] = sorted(flags)
    out_file = out_file or os.path.join(data_dir, "filter_artifacts.json")
    with open(out_file, "w") as f:
        json.dump({k: list(v) for k, v in result.items()}, f, indent=1)
    return result


def load_filter_file(path):
    """Filter file -> {episode: [push_idx]} for preprocess."""
    with open(path) as f:
        return {k: list(v) for k, v in json.load(f).items()}
