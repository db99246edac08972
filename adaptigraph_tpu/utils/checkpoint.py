"""Checkpointing: parameter/optimizer pytrees to disk.

Plays the role of the reference's ``torch.save(model.state_dict())``
(reference: ``src/dynamics/train/train.py:139-142``); epoch-tagged files plus
``latest`` mirror its layout. Pytrees are stored as npz (one array per leaf,
keyed by tree path) so checkpoints are plain portable numpy archives.
"""

import os
import pickle

import numpy as np

import jax


def save_pytree(path, tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, __treedef__=np.frombuffer(pickle.dumps(treedef), dtype=np.uint8), **arrays)


def load_pytree(path):
    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["__treedef__"].tobytes())
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files) - 1)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_name(out_dir, epoch):
    return os.path.join(out_dir, "checkpoints", f"model_{epoch}.npz")


def latest_name(out_dir):
    return os.path.join(out_dir, "checkpoints", "latest.npz")


def save_checkpoint(out_dir, epoch, params, opt_state=None):
    os.makedirs(os.path.join(out_dir, "checkpoints"), exist_ok=True)
    # epoch-tagged cadence per train.py:139-142
    if ((epoch + 1) < 100 and (epoch + 1) % 10 == 0) or (epoch + 1) % 100 == 0:
        save_pytree(checkpoint_name(out_dir, epoch + 1), params)
    save_pytree(latest_name(out_dir), params)
    if opt_state is not None:
        save_pytree(os.path.join(out_dir, "checkpoints", "latest_optim.npz"), opt_state)


def load_checkpoint(out_dir, epoch=None):
    path = latest_name(out_dir) if epoch is None else checkpoint_name(out_dir, epoch)
    return load_pytree(path)
