"""PackedDataset vectorized batch assembly + multi-step-per-dispatch training.

Parity targets: ``PackedDataset.make_batch`` must reproduce
``assemble_sample`` (reference semantics: ``src/dynamics/dataset/
dataset.py:117-383``) field-for-field, and ``make_train_steps`` (K optimizer
steps per device dispatch) must match K sequential ``make_train_step`` calls
bit-for-bit given the same keys."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import adaptigraph_tpu.dynamics.graphs as graphs_mod
import adaptigraph_tpu.ops.fps as fps_mod
from adaptigraph_tpu.dynamics import train as train_mod
from adaptigraph_tpu.dynamics.dataset import (BatchLoader, DynDataset,
                                              PackedDataset)
from adaptigraph_tpu.dynamics.graphs import GraphSpec, assemble_sample, collate
from adaptigraph_tpu.dynamics.preprocess import preprocess
from adaptigraph_tpu.models.gnn import GNNConfig, init_params
from adaptigraph_tpu.ops.graph import EdgeConfig
from adaptigraph_tpu.sim.synthetic import SYNTH_EEF_OFFSETS, gen_rope_dataset

PHYS_SPECS = [{"name": "stiffness", "use": True, "min": 0.0, "max": 1.0}]

SPEC = GraphSpec(
    n_his=4, n_future=3, max_nobj=40, max_neef=1,
    fps_radius_range=(0.18, 0.22), adj_radius_range=(0.48, 0.52), topk=10,
)


@pytest.fixture(scope="module")
def prep_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fastdata")
    sim_dir, prep = str(root / "sim"), str(root / "prep")
    gen_rope_dataset(sim_dir, n_episodes=4, n_pushes=2, seed=0, n_particles=30)
    preprocess(sim_dir, prep, SYNTH_EEF_OFFSETS, n_his=4, n_future=3,
               dist_thresh=0.1, phys_param_specs=PHYS_SPECS)
    return prep


class _MidRng:
    """rng stub: uniforms at the range midpoint, randints at zero — pins
    every random draw so the two assembly paths are comparable."""

    def uniform(self, lo, hi, size=None):
        mid = (lo + hi) / 2.0
        return np.full(size, mid, np.float64) if size is not None else mid

    def randint(self, lo, hi=None, size=None):
        if size is not None:
            return np.zeros(size, np.int64)
        return int(lo if hi is not None else 0)


def _fixed_fps(pcd, num, radius, rng=None, start_idx=None):
    # deterministic, order-scrambling, deliberately under-full selection
    m = max(1, min(num, len(pcd)) - 3)
    return np.arange(m)[::-1].copy()


def test_packed_matches_assemble_sample(prep_dir, monkeypatch):
    monkeypatch.setattr(fps_mod, "fps_downsample", _fixed_fps)
    monkeypatch.setattr(graphs_mod, "fps_downsample", _fixed_fps)

    ratio = {"train": [0, 0.75], "valid": [0.75, 1]}
    slow = DynDataset(prep_dir, SPEC, phase="train", ratio=ratio)
    fast = PackedDataset(prep_dir, SPEC, phase="train", ratio=ratio,
                         n_fps_variants=1)
    assert len(slow) == len(fast)

    idxs = np.asarray([0, 3, 5, len(slow) - 1])
    got = fast.make_batch(idxs, _MidRng())
    want = collate([
        assemble_sample(SPEC, slow._episode(slow.index[i][0])["obj_pos"],
                        slow._episode(slow.index[i][0])["eef_pos"],
                        slow._episode(slow.index[i][0])["pairs"][slow.index[i][1]],
                        slow.physics_norm[slow.index[i][0]], _MidRng())
        for i in idxs
    ])
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=0, rtol=0,
                                   err_msg=f"field {k}")


def test_compact_batch_expands_to_full(prep_dir):
    """compact=True ships eef keypoints + obj_mask only; on-device expansion
    (train.expand_compact_batch) must reproduce the full batch field-for-
    field, and the train step must produce an identical loss from either."""
    import optax

    ratio = {"train": [0, 1.0], "valid": [0, 1.0]}
    full = PackedDataset(prep_dir, SPEC, phase="train", ratio=ratio,
                         n_fps_variants=1)
    comp = PackedDataset(prep_dir, SPEC, phase="train", ratio=ratio,
                         n_fps_variants=1, compact=True)
    idxs = np.asarray([0, 2, 4, len(full) - 1])
    want = full.make_batch(idxs, _MidRng())
    got_c = comp.make_batch(idxs, _MidRng())
    gnn = GNNConfig(n_his=4, max_nobj=SPEC.max_nobj, max_neef=1,
                    nf_particle=16, nf_relation=16, nf_effect=16, pstep=2)
    got = {k: np.asarray(v)
           for k, v in train_mod.expand_compact_batch(got_c, gnn).items()}
    assert set(want) <= set(got)
    for k in want:
        np.testing.assert_array_equal(got[k], np.asarray(want[k]),
                                      err_msg=f"field {k}")

    edge = EdgeConfig(max_nobj=SPEC.max_nobj, max_neef=1, topk=10)
    hyper = train_mod.TrainHyper(n_future=3, state_noise_train=0.01)
    opt = optax.adam(1e-3)
    params = init_params(jax.random.PRNGKey(0), gnn)
    step = train_mod.make_train_step(gnn, edge, hyper, opt)
    key = jax.random.PRNGKey(1)
    # the step donates params/opt_state — give each call its own copy
    p1 = jax.tree_util.tree_map(jnp.array, params)
    p2 = jax.tree_util.tree_map(jnp.array, params)
    _, _, loss_full = step(p1, opt.init(p1), want, key)
    _, _, loss_comp = step(p2, opt.init(p2), got_c, key)
    np.testing.assert_allclose(float(loss_full), float(loss_comp), rtol=0, atol=0)


def test_packed_real_fps_valid(prep_dir):
    """With the real FPS: cached indices are in-range, counts sensible, and
    the batch is finite with the object slots zero beyond the count."""
    fast = PackedDataset(prep_dir, SPEC, phase="train",
                         ratio={"train": [0, 1.0], "valid": [0, 1.0]},
                         n_fps_variants=2)
    rng = np.random.RandomState(0)
    b = fast.make_batch(rng.randint(0, len(fast), size=8), rng)
    assert b["state"].shape == (8, 4, SPEC.n_nodes, 3)
    assert np.isfinite(b["state"]).all()
    cnts = b["obj_mask"].sum(1)
    assert (cnts >= 1).all() and (cnts <= SPEC.max_nobj).all()
    # padded object slots are exactly zero in every frame
    dead = ~b["obj_mask"]
    assert np.abs(b["state"][:, :, : SPEC.max_nobj][dead[:, None].repeat(4, 1)]).sum() == 0
    assert 0.48 <= b["adj_thresh"].min() <= b["adj_thresh"].max() <= 0.52


def test_loader_stack_steps(prep_dir):
    fast = PackedDataset(prep_dir, SPEC, phase="train",
                         ratio={"train": [0, 1.0], "valid": [0, 1.0]})
    loader = BatchLoader(fast, batch_size=4, seed=0, stack_steps=3)
    b = next(loader)
    assert b["state"].shape == (3, 4, 4, SPEC.n_nodes, 3)
    assert b["adj_thresh"].shape == (3, 4)
    loader.close()


def test_train_steps_matches_sequential(prep_dir):
    """K-steps-per-dispatch == K sequential steps, same keys."""
    import optax

    fast = PackedDataset(prep_dir, SPEC, phase="train",
                         ratio={"train": [0, 1.0], "valid": [0, 1.0]})
    rng = np.random.RandomState(1)
    K, B = 4, 4
    sb = fast.make_batch(rng.randint(0, len(fast), size=K * B), rng)
    sb = {k: v.reshape((K, B) + v.shape[1:]) for k, v in sb.items()}

    gnn_cfg = GNNConfig(n_his=4, max_nobj=40, max_neef=1, nf_particle=16,
                        nf_relation=16, nf_effect=16, pstep=2)
    edge_cfg = EdgeConfig(max_nobj=40, max_neef=1, topk=5)
    hyper = train_mod.TrainHyper(n_future=3, state_noise_train=0.01)
    opt = optax.adam(1e-3)

    params0 = init_params(jax.random.PRNGKey(0), gnn_cfg)
    opt_state0 = opt.init(params0)
    keys = jax.random.split(jax.random.PRNGKey(7), K)

    step = train_mod.make_train_step(gnn_cfg, edge_cfg, hyper, opt)
    p_seq, o_seq = jax.tree_util.tree_map(lambda x: x.copy(), (params0, opt_state0))
    seq_losses = []
    for k in range(K):
        batch = {kk: v[k] for kk, v in sb.items()}
        p_seq, o_seq, loss = step(p_seq, o_seq, batch, keys[k])
        seq_losses.append(float(loss))

    steps = train_mod.make_train_steps(gnn_cfg, edge_cfg, hyper, opt)
    p_multi, _, losses = steps(params0, opt_state0, sb, keys)

    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_seq),
                    jax.tree_util.tree_leaves(p_multi)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_eval_steps_finite(prep_dir):
    fast = PackedDataset(prep_dir, SPEC, phase="valid",
                         ratio={"train": [0, 0.75], "valid": [0.75, 1]})
    rng = np.random.RandomState(2)
    K, B = 3, 4
    sb = fast.make_batch(rng.randint(0, len(fast), size=K * B), rng)
    sb = {k: v.reshape((K, B) + v.shape[1:]) for k, v in sb.items()}
    gnn_cfg = GNNConfig(n_his=4, max_nobj=40, max_neef=1, nf_particle=16,
                        nf_relation=16, nf_effect=16, pstep=2)
    edge_cfg = EdgeConfig(max_nobj=40, max_neef=1, topk=5)
    hyper = train_mod.TrainHyper(n_future=3)
    params = init_params(jax.random.PRNGKey(0), gnn_cfg)
    ev = train_mod.make_eval_steps(gnn_cfg, edge_cfg, hyper)
    losses = ev(params, sb, jax.random.split(jax.random.PRNGKey(1), K))
    assert losses.shape == (K,)
    assert np.isfinite(np.asarray(losses)).all()


def test_train_loop_superbatch(prep_dir, tmp_path):
    """Full train() loop through the stacked-superbatch path."""
    fast_tr = PackedDataset(prep_dir, SPEC, phase="train",
                            ratio={"train": [0, 1.0], "valid": [0, 1.0]})
    tr = BatchLoader(fast_tr, batch_size=4, seed=0, stack_steps=3)
    va = BatchLoader(fast_tr, batch_size=4, seed=1, stack_steps=3)
    gnn_cfg = GNNConfig(n_his=4, max_nobj=40, max_neef=1, nf_particle=16,
                        nf_relation=16, nf_effect=16, pstep=2)
    edge_cfg = EdgeConfig(max_nobj=40, max_neef=1, topk=5)
    hyper = train_mod.TrainHyper(n_future=3, n_epochs=2, n_iters_train=6,
                                 n_iters_valid=3, state_noise_train=0.01)
    params, curves = train_mod.train(gnn_cfg, edge_cfg, hyper, tr, va,
                                     str(tmp_path / "out"))
    tr.close()
    va.close()
    assert len(curves["train"]) == 2
    assert np.isfinite(curves["train"]).all()
    assert curves["train"][-1] < curves["train"][0]
