"""Data-generation driver: episodes of randomized pushes -> h5.

Re-implements the reference driver (reference:
``src/sim/data_gen/data_gen.py:16-239``): per-episode worker that resets the
env, samples+executes pushes with a validity gate and bounded retries, stores
one h5 per push plus the episode physics properties, fanned out over a
process pool.
"""

import multiprocessing as mp
import os

import numpy as np

from adaptigraph_tpu.sim import io as sim_io
from adaptigraph_tpu.sim.env import PushEnv

MAX_RETRIES = 10  # reference: data_gen.py:77 retry budget


def gen_episode(data_dir, material, epi_idx, n_pushes, seed,
                capture_depth=False, robot=False):
    epi_dir = os.path.join(data_dir, f"{epi_idx:06d}")
    os.makedirs(epi_dir, exist_ok=True)
    env = PushEnv(material, seed=seed, capture_depth=capture_depth, robot=robot)
    env.reset()
    fixed_mask = env.get_fixed_mask()

    push_idx = 0
    bad = False
    while push_idx < n_pushes:
        for attempt in range(MAX_RETRIES):
            kind, action = env.sample_action()
            before = env.get_positions()
            positions, eef_states = env.execute_action(kind, action)
            if not np.isfinite(positions).all():
                # simulator blow-up aborts the episode
                # (reference: flex_env.py:458-460 NaN check)
                bad = True
                break
            if env.push_moved_object(before, positions):
                break
        else:
            bad = True
        if bad:
            break
        push_idx += 1
        inv0 = np.tile(fixed_mask[None, :, None], (positions.shape[0], 1, 1))
        sim_io.store_episode_step(
            os.path.join(epi_dir, f"{push_idx:02d}.h5"),
            positions,
            eef_states,
            action,
            observations=env.last_observations(),
            inv_weight_is_0=inv0,
            particle_2_instance=env.scene.get_instance(),
        )
    sim_io.store_properties(epi_dir, env.properties)
    cams = env.camera_params()
    if cams is not None:
        # per-episode camera parameters (reference: data_gen saves camera npy)
        np.savez(os.path.join(epi_dir, "cameras.npz"), **cams)
    return epi_idx, push_idx, bad


def _worker(args):
    return gen_episode(*args)


def generate(data_dir, material, n_episodes, n_pushes=5, n_workers=1, seed=0,
             capture_depth=False, robot=False, start_episode=0):
    """Fan episodes out over a process pool (reference: data_gen.py:215-239).
    ``robot=True`` drives every push through the xArm6 IK chain with the
    tool's contact-face collision geometry (reference: flex_env.py:308-481).
    ``start_episode`` extends an existing dataset in place: episode ``e``
    always draws seed ``seed + e*997``, so generating [0,100) then
    [100,300) with the same base seed is identical to one [0,300) run.
    Returns the list of bad episode indices (reference: bad_episodes.txt)."""
    os.makedirs(data_dir, exist_ok=True)
    jobs = [(data_dir, material, e, n_pushes, seed + e * 997, capture_depth,
             robot)
            for e in range(start_episode, start_episode + n_episodes)]
    if n_workers > 1:
        with mp.Pool(n_workers) as pool:
            results = pool.map(_worker, jobs)
    else:
        results = [_worker(j) for j in jobs]
    bad = [e for e, _, b in results if b]
    if bad:
        # append: an extend run must not clobber the base run's bad list
        with open(os.path.join(data_dir, "bad_episodes.txt"), "a") as f:
            f.write("\n".join(str(b) for b in bad) + "\n")
    return bad
