"""Preprocessing: raw simulated episodes -> training artifacts.

Re-implements the reference preprocessing pass (reference:
``src/dynamics/preprocess/preprocess.py:44-362``):

- eef 14-dof states -> 3D keypoints by quaternion-rotating configured offsets
- frame-pair extraction: for each frame, walk backward ``n_his`` and forward
  ``n_future`` frames spaced by eef displacement >= ``dist_thresh``
- physics-parameter extraction + min/max normalization to [0, 1]
  (reference: ``src/dynamics/dataset/load.py:69-82`` — folded in here so the
  dataset reads ready-normalized values)

Outputs the npz layout documented in ``adaptigraph_tpu.dynamics.dataset``.
"""

import os

import numpy as np

from adaptigraph_tpu.sim import io as sim_io
from adaptigraph_tpu.dynamics.dataset import save_episode, save_physics, save_meta
from adaptigraph_tpu.utils.transforms import quat_to_rotmat


def process_eef(eef_states, eef_offsets):
    """(T, N_eef_raw, 14) eef states -> (T, max_neef, 3) keypoints
    (reference: preprocess.py:44-71).

    Each configured offset is rotated by the eef quaternion and added to the
    eef position; when fewer raw eef states than offsets exist (granular flat
    pusher), the last raw state is reused.
    """
    eef_states = np.asarray(eef_states)
    if eef_states.ndim == 2:
        eef_states = eef_states[:, None, :]
    T, n_raw, _ = eef_states.shape
    n_kp = len(eef_offsets)
    out = np.zeros((T, n_kp, 3), np.float32)
    for j in range(n_kp):
        raw_j = min(j, n_raw - 1)
        pos = eef_states[:, raw_j, 0:3]  # (T, 3)
        quat = eef_states[:, raw_j, 6:10]  # (T, 4) xyzw
        rot = quat_to_rotmat(quat)  # (T, 3, 3)
        out[:, j] = pos + np.einsum("tij,j->ti", rot, np.asarray(eef_offsets[j], np.float64))
    return out


def extract_frame_pairs(eef_kp, dist_thresh, n_his, n_future, frame_offset=0, store_rest_state=False):
    """Frame-pair extraction (reference: preprocess.py:106-176).

    For every frame ``fj`` of a push, find up to ``n_his`` history frames
    walking backward and ``n_future`` future frames walking forward, each
    spaced by >= ``dist_thresh`` eef displacement; pad by repeating the last
    found frame. ``frame_offset`` shifts indices into episode-global frame
    numbering. With ``store_rest_state`` the history is one frame shorter and
    frame 0 (episode rest state, *not* offset) is prepended.

    Returns (n_frames, n_his + n_future) int array.
    """
    eef = np.asarray(eef_kp)[:, 0]  # (T, 3), first keypoint like preprocess.py:111
    T = eef.shape[0]
    rows = []
    for fj in range(T):
        # backward history
        traj = [fj]
        cur = eef[fj]
        fi = fj
        target_hist = n_his - 1 if store_rest_state else n_his
        while fi >= 0 and len(traj) < target_hist:
            if np.linalg.norm(cur - eef[fi]) >= dist_thresh:
                traj.append(fi)
                cur = eef[fi]
            fi -= 1
        traj = traj + [traj[-1]] * (target_hist - len(traj))
        traj = traj[::-1]

        # forward futures
        cur = eef[fj]
        fi = fj
        while fi < T and len(traj) < target_hist + n_future:
            if np.linalg.norm(cur - eef[fi]) >= dist_thresh:
                traj.append(fi)
                cur = eef[fi]
            fi += 1
        traj = traj + [traj[-1]] * (target_hist + n_future - len(traj))

        row = np.asarray(traj) + frame_offset
        if store_rest_state:
            row = np.concatenate([[0], row])
        rows.append(row)
    return np.asarray(rows, np.int64)


def preprocess(data_dir, prep_dir, eef_offsets, n_his, n_future, dist_thresh,
               phys_param_specs, store_rest_state=False, filter_actions=None):
    """Process every episode under ``data_dir`` into ``prep_dir``.

    Args:
      phys_param_specs: list of dicts with keys name/use/min/max, matching the
        material_config (reference: config yamls ``material_config`` and
        preprocess.py:73-104 ``extract_physics``).
      filter_actions: optional {episode_name: [push_idx, ...]} of pushes to
        drop (reference: preprocess.py:22-41 filter file).
    """
    os.makedirs(os.path.join(prep_dir, "episodes"), exist_ok=True)
    epi_names = sim_io.list_episodes(data_dir)
    raw_phys = []
    norm_phys = []
    for slot, epi in enumerate(epi_names):
        epi_dir = os.path.join(data_dir, epi)
        props = sim_io.load_properties(epi_dir)

        raw = np.array([props[s["name"]] for s in phys_param_specs if s["use"]], np.float32)
        norm = np.array(
            [
                (props[s["name"]] - s["min"]) / (s["max"] - s["min"] + 1e-6)
                for s in phys_param_specs
                if s["use"]
            ],
            np.float32,
        )
        raw_phys.append(raw)
        norm_phys.append(norm)

        obj_chunks, eef_chunks, pair_chunks = [], [], []
        push_bounds = [0]
        n_frames = 0
        fixed_mask = None
        for push_idx, push_file in enumerate(sim_io.list_pushes(epi_dir), start=1):
            data = sim_io.load_episode_step(os.path.join(epi_dir, push_file))
            if fixed_mask is None and "particle_inv_weight_is_0" in data:
                fm = np.asarray(data["particle_inv_weight_is_0"])
                fixed_mask = fm.reshape(fm.shape[0], fm.shape[1], -1)[0, :, 0].astype(bool)
            eef_kp = process_eef(data["eef_states"], eef_offsets)
            pairs = extract_frame_pairs(
                eef_kp, dist_thresh, n_his, n_future, n_frames, store_rest_state
            )
            obj_chunks.append(data["positions"])
            eef_chunks.append(eef_kp)
            n_frames += len(pairs)
            push_bounds.append(n_frames)
            if filter_actions and push_idx in filter_actions.get(epi, []):
                continue
            pair_chunks.append(pairs)

        save_episode(
            os.path.join(prep_dir, "episodes", f"{slot:06d}.npz"),
            np.concatenate(obj_chunks, axis=0),
            np.concatenate(eef_chunks, axis=0),
            np.concatenate(pair_chunks, axis=0) if pair_chunks else np.zeros((0, n_his + n_future), np.int64),
            fixed_mask=fixed_mask,
            push_bounds=push_bounds,
        )

    save_physics(prep_dir, np.stack(raw_phys), np.stack(norm_phys))
    save_meta(prep_dir, {"n_his": n_his, "n_future": n_future, "dist_thresh": dist_thresh,
                         "store_rest_state": store_rest_state, "n_episodes": len(epi_names)})
    return len(epi_names)
