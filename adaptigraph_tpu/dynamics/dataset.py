"""Dataset and batch loading for dynamics training.

Plays the role of the reference ``DynDataset`` + torch ``DataLoader``
(reference: ``src/dynamics/dataset/dataset.py:10-115``,
``src/dynamics/train/train.py:41-55``): loads preprocessed episodes
(positions + frame pairs + normalized physics params), assembles fixed-shape
samples on the host and double-buffers batches toward the device.

On-disk layout produced by ``adaptigraph_tpu.dynamics.preprocess``::

    <prep_dir>/<name>/
        episodes/<epi:06d>.npz    # obj_pos (T,No,3), eef_pos (T,Ne,3),
                                  # pairs (P, n_his+n_future), fixed_mask opt.
        physics.npz               # raw (n_epis, phys_dim) + normalized
        meta.json                 # n_his/n_future/dist_thresh

The train/valid split is by episode ratio (reference:
``src/dynamics/dataset/load.py:49-55``; physics normalization per
``load.py:69-82`` happens at preprocess time).
"""

import json
import os
import queue
import threading

import numpy as np

from adaptigraph_tpu.dynamics.graphs import GraphSpec, assemble_sample, collate


def spec_from_config(config):
    dc = config["dataset_config"]
    ds = dc["datasets"][0]
    matc = config["material_config"]
    material = dc["materials"][0]
    phys_dim = sum(1 for p in matc[material]["physics_params"] if p["use"])
    return GraphSpec(
        n_his=dc["n_his"],
        n_future=dc["n_future"],
        max_nobj=ds["max_nobj"],
        max_neef=dc["eef"]["max_neef"],
        fps_radius_range=tuple(ds["fps_radius_range"]),
        adj_radius_range=tuple(ds["adj_radius_range"]),
        topk=ds["topk"],
        knn_range=tuple(ds.get("knn_range", [1.0, 1.0])),
        store_rest_state=dc.get("store_rest_state", False),
        phys_dim=phys_dim,
    )


class DynDataset:
    """Index over (episode, frame-pair) samples for one phase."""

    def __init__(self, prep_dir, spec: GraphSpec, phase="train", ratio=None, seed=0):
        assert phase in ("train", "valid")
        self.spec = spec
        self.phase = phase
        self.prep_dir = prep_dir

        epi_dir = os.path.join(prep_dir, "episodes")
        epi_files = sorted(f for f in os.listdir(epi_dir) if f.endswith(".npz"))
        n_epis = len(epi_files)
        ratio = ratio or {"train": [0, 0.98], "valid": [0.98, 1]}
        lo = int(n_epis * ratio[phase][0])
        hi = int(n_epis * ratio[phase][1])
        self.epi_files = [os.path.join(epi_dir, f) for f in epi_files[lo:hi]]

        phys = np.load(os.path.join(prep_dir, "physics.npz"))
        self.physics_norm = phys["normalized"][lo:hi]  # (n_epis_phase, phys_dim)

        # (sample -> (episode slot, pair row)) index, mirroring load_pairs
        # (reference: load.py:6-25)
        self._episodes = []
        self.index = []
        for ei, f in enumerate(self.epi_files):
            with np.load(f) as z:
                pairs = z["pairs"]
            self._episodes.append(None)  # lazy cache
            for pi in range(len(pairs)):
                self.index.append((ei, pi))
        self._lock = threading.Lock()

    def __len__(self):
        return len(self.index)

    # picklable for spawn-context loader workers: drop the lock and the
    # lazy episode cache (each worker re-reads its own episodes)
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_lock"] = None
        state["_episodes"] = [None] * len(self._episodes)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._lock = threading.Lock()

    def _episode(self, ei):
        with self._lock:
            if self._episodes[ei] is None:
                with np.load(self.epi_files[ei]) as z:
                    self._episodes[ei] = {k: z[k] for k in z.files}
            return self._episodes[ei]

    def sample(self, idx, rng):
        ei, pi = self.index[idx]
        epi = self._episode(ei)
        return assemble_sample(
            self.spec,
            epi["obj_pos"],
            epi["eef_pos"],
            epi["pairs"][pi],
            self.physics_norm[ei],
            rng,
        )


def _mp_loader_worker(dataset, batch_size, seed, q, stop):
    rng = np.random.RandomState(seed)
    while not stop.is_set():
        try:
            idxs = rng.randint(0, len(dataset), size=batch_size)
            batch = collate([dataset.sample(int(i), rng) for i in idxs])
        except BaseException:  # surface in the consumer, don't die silently
            import traceback

            q.put({"__loader_error__": traceback.format_exc()})
            return
        while not stop.is_set():
            try:
                q.put(batch, timeout=1.0)
                break
            except queue.Full:
                continue


class BatchLoader:
    """Infinite shuffled batch iterator (the TPU-era stand-in for
    ``DataLoader(num_workers=8)`` + ``dataloader_wrapper``, reference:
    train.py:48-55).

    ``num_workers=0`` assembles batches in one background thread;
    ``num_workers>=1`` forks that many worker *processes* (host batch
    assembly is GIL-bound Python at ~130 ms per batch-128 at rope scale —
    a single thread throttles a ~18 ms jitted train step). Each worker
    samples independently with its own seed, statistically equivalent to
    the reference's shuffled epoch for with-replacement training."""

    def __init__(self, dataset: DynDataset, batch_size, seed=0, prefetch=2,
                 num_workers=0, mp_context="fork"):
        self.ds = dataset
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)
        self._procs = []
        if num_workers >= 1:
            import multiprocessing as mp

            # fork shares the dataset copy-on-write (fast start) but is only
            # safe BEFORE the JAX runtime spins up its threads; use "spawn"
            # when forking after device init (e.g. bench.py)
            ctx = mp.get_context(mp_context)
            self._q = ctx.Queue(maxsize=max(prefetch, 2 * num_workers))
            self._stop = ctx.Event()
            for w in range(num_workers):
                p = ctx.Process(
                    target=_mp_loader_worker,
                    args=(dataset, batch_size, seed + 7919 * w, self._q, self._stop),
                    daemon=True,
                )
                p.start()
                self._procs.append(p)
        else:
            self._q = queue.Queue(maxsize=prefetch)
            self._stop = threading.Event()
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()

    def _make_batch(self):
        idxs = self.rng.randint(0, len(self.ds), size=self.batch_size)
        return collate([self.ds.sample(int(i), self.rng) for i in idxs])

    def _worker(self):
        while not self._stop.is_set():
            try:
                self._q.put(self._make_batch(), timeout=1.0)
            except queue.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self):
        batch = self._q.get()
        if isinstance(batch, dict) and "__loader_error__" in batch:
            raise RuntimeError(
                "batch-assembly worker failed:\n" + batch["__loader_error__"])
        return batch

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        for p in self._procs:
            p.join(timeout=2.0)
            if p.is_alive():
                p.terminate()


def save_episode(path, obj_pos, eef_pos, pairs, fixed_mask=None, push_bounds=None):
    data = dict(
        obj_pos=obj_pos.astype(np.float32),
        eef_pos=eef_pos.astype(np.float32),
        pairs=np.asarray(pairs, np.int32),
    )
    if fixed_mask is not None:
        data["fixed_mask"] = fixed_mask.astype(bool)
    if push_bounds is not None:
        # frame index where each push starts, plus the total frame count:
        # push p spans [push_bounds[p], push_bounds[p+1])
        data["push_bounds"] = np.asarray(push_bounds, np.int32)
    np.savez_compressed(path, **data)


def save_physics(prep_dir, raw, normalized):
    np.savez(
        os.path.join(prep_dir, "physics.npz"),
        raw=np.asarray(raw, np.float32),
        normalized=np.asarray(normalized, np.float32),
    )


def save_meta(prep_dir, meta: dict):
    with open(os.path.join(prep_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
