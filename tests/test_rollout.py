"""Autoregressive rollout evaluator tests (reference semantics:
src/dynamics/rollout/rollout.py:21-269)."""

import numpy as np
import pytest

import jax

from adaptigraph_tpu.dynamics.rollout import frame_chain, rollout_episode, rollout_dataset
from adaptigraph_tpu.dynamics.graphs import GraphSpec
from adaptigraph_tpu.models.gnn import GNNConfig, init_params
from adaptigraph_tpu.ops.graph import EdgeConfig
from adaptigraph_tpu.sim.synthetic import gen_rope_dataset, SYNTH_EEF_OFFSETS
from adaptigraph_tpu.dynamics.preprocess import preprocess

SPEC = GraphSpec(
    n_his=4, n_future=3, max_nobj=40, max_neef=1,
    fps_radius_range=(0.18, 0.22), adj_radius_range=(0.48, 0.52), topk=10,
)
GNN = GNNConfig(n_his=4, max_nobj=40, max_neef=1, nf_particle=16, nf_relation=16,
                nf_effect=16, pstep=2)
ECFG = EdgeConfig(max_nobj=40, max_neef=1, topk=10)


def test_frame_chain_spacing():
    T = 20
    eef = np.zeros((T, 1, 3))
    eef[:, 0, 0] = np.arange(T) * 0.06
    chain = frame_chain(eef, 0, 0.1, max_steps=5)
    assert chain.tolist() == [0, 2, 4, 6, 8, 10]


@pytest.fixture(scope="module")
def prep_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ro")
    sim_dir = str(root / "sim")
    prep = str(root / "prep")
    gen_rope_dataset(sim_dir, n_episodes=2, n_pushes=2, seed=3, n_particles=30)
    preprocess(sim_dir, prep, SYNTH_EEF_OFFSETS, n_his=4, n_future=3, dist_thresh=0.1,
               phys_param_specs=[{"name": "stiffness", "use": True, "min": 0.0, "max": 1.0}])
    return prep


def test_rollout_episode_mechanics(prep_dir):
    from adaptigraph_tpu.dynamics.dataset import DynDataset

    ds = DynDataset(prep_dir, SPEC, phase="valid", ratio={"train": [0, 0], "valid": [0, 1]})
    epi = ds._episode(0)
    params = init_params(jax.random.PRNGKey(0), GNN)
    errors, preds, chain, fps_idx = rollout_episode(
        params, SPEC, GNN, ECFG, epi["obj_pos"], epi["eef_pos"], ds.physics_norm[0],
        start=0, dist_thresh=0.1, max_steps=10,
    )
    assert len(chain) >= 2
    assert errors.shape == (len(chain) - 1,)
    assert np.isfinite(errors).all()
    assert preds.shape == (len(chain) - 1, 40, 3)

    # keep_prev_fps semantics (reference: rollout.py:335-338): forcing a
    # previous push's FPS indices changes which particles are evaluated
    # but the pipeline stays finite and the indices are honored verbatim
    forced = fps_idx[: max(2, len(fps_idx) // 2)]
    errors2, _, _, used = rollout_episode(
        params, SPEC, GNN, ECFG, epi["obj_pos"], epi["eef_pos"], ds.physics_norm[0],
        start=0, dist_thresh=0.1, max_steps=10, fps_idx=forced,
    )
    assert np.array_equal(used, forced)
    assert np.isfinite(errors2).all()


def test_rollout_dataset_stats(prep_dir):
    params = init_params(jax.random.PRNGKey(0), GNN)
    stats = rollout_dataset(params, SPEC, GNN, ECFG, prep_dir, phase_ratio=(0.0, 1.0),
                            dist_thresh=0.1, max_steps=8)
    assert len(stats["median"]) > 0
    assert np.isfinite(stats["median"]).all()
    assert (stats["q25"] <= stats["q75"] + 1e-9).all()


def test_rollout_hetero_per_particle_physics():
    """Per-particle physics arrays flow through the rollout (the reference's
    'hetero' mode, rollout/graph.py:591-643): a homogeneous per-particle
    vector must match the scalar param exactly, and a split-half assignment
    must change the prediction."""
    import jax
    import jax.numpy as jnp

    from adaptigraph_tpu.dynamics.rollout import rollout_scan
    from adaptigraph_tpu.models.gnn import GNNConfig, init_params
    from adaptigraph_tpu.ops.graph import EdgeConfig

    gnn = GNNConfig(n_his=2, max_nobj=16, max_neef=1, nf_particle=16,
                    nf_relation=16, nf_effect=16, pstep=2)
    edge = EdgeConfig(max_nobj=16, max_neef=1, topk=5)
    params = init_params(jax.random.PRNGKey(0), gnn)
    rng = np.random.RandomState(0)
    N = gnn.n_nodes
    hist = jnp.asarray(rng.randn(2, N, 3).astype(np.float32) * 0.2)
    T = 3
    eef_seq = jnp.asarray(rng.randn(T, 1, 3).astype(np.float32) * 0.2)
    gt_seq = jnp.asarray(rng.randn(T, 16, 3).astype(np.float32) * 0.2)
    args = (params, hist, eef_seq, gt_seq, jnp.ones(N, bool),
            jnp.zeros(N, bool).at[16].set(True),
            jnp.zeros((N, 2)).at[:16, 0].set(1.0).at[16, 1].set(1.0),
            jnp.ones((16, 1)))
    tail = (jnp.asarray(16), jnp.asarray(0.8), gnn, edge)

    _, pred_scalar = rollout_scan(*args, jnp.asarray([0.4]), *tail)
    _, pred_homog = rollout_scan(*args, jnp.full(16, 0.4), *tail)
    np.testing.assert_allclose(np.asarray(pred_homog), np.asarray(pred_scalar),
                               rtol=1e-5, atol=1e-6)
    split = jnp.full(16, 0.4).at[8:].set(0.9)
    _, pred_hetero = rollout_scan(*args, split, *tail)
    assert np.abs(np.asarray(pred_hetero) - np.asarray(pred_scalar)).max() > 1e-4


def test_batched_rollout_matches_sequential(prep_dir):
    """rollout_pushes_batched (one batched scan over all pushes) must
    reproduce the sequential per-push rollout_scan numbers exactly on the
    XLA path, including chains of different lengths (padded steps)."""
    from adaptigraph_tpu.dynamics.dataset import DynDataset
    from adaptigraph_tpu.dynamics.rollout import (_prepare_push,
                                                  rollout_pushes_batched)

    ds = DynDataset(prep_dir, SPEC, phase="valid",
                    ratio={"train": [0, 0.5], "valid": [0.5, 1.0]})
    params = init_params(jax.random.PRNGKey(0), GNN)
    epi = ds._episode(0)
    pb = epi["push_bounds"]

    pushes, seq_errors = [], []
    for p in range(len(pb) - 1):
        b0, b1 = int(pb[p]), int(pb[p + 1])
        if b1 - b0 < 4:
            continue
        prep = _prepare_push(SPEC, epi["obj_pos"][b0:b1], epi["eef_pos"][b0:b1],
                             ds.physics_norm[0], 0.1, 100)
        if prep is None:
            continue
        pushes.append(prep)
        errs, _, _, _ = rollout_episode(params, SPEC, GNN, ECFG,
                                        epi["obj_pos"][b0:b1],
                                        epi["eef_pos"][b0:b1],
                                        ds.physics_norm[0], start=0,
                                        dist_thresh=0.1, max_steps=100)
        seq_errors.append(errs)
    assert len(pushes) >= 2
    # force different chain lengths to exercise the step_valid freeze
    pushes[0]["T"] = max(1, pushes[0]["T"] - 1)
    pushes[0]["eef_seq"] = pushes[0]["eef_seq"][: pushes[0]["T"]]
    pushes[0]["gt_seq"] = pushes[0]["gt_seq"][: pushes[0]["T"]]
    seq_errors[0] = seq_errors[0][: pushes[0]["T"]]

    batched = rollout_pushes_batched(params, SPEC, GNN, ECFG, pushes,
                                     use_fused=False)
    assert len(batched) == len(seq_errors)
    for b, s in zip(batched, seq_errors):
        np.testing.assert_allclose(b, s, rtol=1e-5, atol=1e-6)


def test_batched_rollout_fused_interpret_matches_xla(prep_dir):
    """The fused-forward batched evaluator (interpret mode) matches the XLA
    batched evaluator within kernel tolerance."""
    from adaptigraph_tpu.dynamics.dataset import DynDataset
    from adaptigraph_tpu.dynamics.rollout import (_prepare_push,
                                                  rollout_pushes_batched)

    ds = DynDataset(prep_dir, SPEC, phase="valid",
                    ratio={"train": [0, 0.5], "valid": [0.5, 1.0]})
    params = init_params(jax.random.PRNGKey(0), GNN)
    epi = ds._episode(0)
    prep = _prepare_push(SPEC, epi["obj_pos"], epi["eef_pos"],
                         ds.physics_norm[0], 0.1, 4)
    assert prep is not None
    xla = rollout_pushes_batched(params, SPEC, GNN, ECFG, [prep], use_fused=False)
    fused = rollout_pushes_batched(params, SPEC, GNN, ECFG, [prep],
                                   use_fused=True, interpret=True)
    np.testing.assert_allclose(fused[0], xla[0], rtol=1e-3, atol=1e-4)
