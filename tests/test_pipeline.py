"""End-to-end data pipeline: synthetic sim -> preprocess -> dataset -> train.

Covers the semantics of preprocess.py frame-pair extraction, DynDataset
assembly and the multi-step training loss (reference: preprocess.py:106-176,
dataset.py:117-383, train.py:94-124)."""

import numpy as np
import pytest

import jax

from adaptigraph_tpu.sim.synthetic import gen_rope_dataset, SYNTH_EEF_OFFSETS
from adaptigraph_tpu.dynamics.preprocess import preprocess, extract_frame_pairs, process_eef
from adaptigraph_tpu.dynamics.dataset import DynDataset, BatchLoader
from adaptigraph_tpu.dynamics.graphs import GraphSpec
from adaptigraph_tpu.dynamics import train as train_mod
from adaptigraph_tpu.models.gnn import GNNConfig, init_params
from adaptigraph_tpu.ops.graph import EdgeConfig

PHYS_SPECS = [
    {"name": "stiffness", "use": True, "min": 0.0, "max": 1.0},
    {"name": "length", "use": False, "min": 0.0, "max": 5.0},
]

SPEC = GraphSpec(
    n_his=4,
    n_future=3,
    max_nobj=40,
    max_neef=1,
    fps_radius_range=(0.18, 0.22),
    adj_radius_range=(0.48, 0.52),
    topk=10,
)


@pytest.fixture(scope="module")
def prep_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    sim_dir = str(root / "sim")
    prep = str(root / "prep")
    gen_rope_dataset(sim_dir, n_episodes=4, n_pushes=2, seed=0, n_particles=30)
    n = preprocess(sim_dir, prep, SYNTH_EEF_OFFSETS, n_his=4, n_future=3, dist_thresh=0.1,
                   phys_param_specs=PHYS_SPECS)
    assert n == 4
    return prep


def test_extract_frame_pairs_spacing():
    # eef moves 0.06 per frame in x; dist_thresh 0.1 -> every 2nd frame
    T = 12
    eef = np.zeros((T, 1, 3))
    eef[:, 0, 0] = np.arange(T) * 0.06
    pairs = extract_frame_pairs(eef, 0.1, n_his=3, n_future=2)
    assert pairs.shape == (T, 5)
    # a middle frame has exact history/future spacing of 2 frames
    row = pairs[6]
    assert row.tolist() == [2, 4, 6, 8, 10]
    # first frame: history padded by repetition
    assert pairs[0].tolist() == [0, 0, 0, 2, 4]


def test_extract_frame_pairs_rest_state():
    T = 10
    eef = np.zeros((T, 1, 3))
    eef[:, 0, 0] = np.arange(T) * 0.1
    pairs = extract_frame_pairs(eef, 0.1, n_his=4, n_future=2, frame_offset=100, store_rest_state=True)
    assert pairs.shape == (T, 6)
    assert (pairs[:, 0] == 0).all()  # rest frame is global index 0, unoffset
    assert (pairs[:, 1:] >= 100).all()


def test_process_eef_offset_rotation():
    T = 2
    eef_states = np.zeros((T, 1, 14))
    eef_states[:, 0, 0:3] = [1.0, 2.0, 3.0]
    # 90 degrees about y: x-axis -> -z ... offset (0,0,1) -> (1,0,0)
    eef_states[:, 0, 6:10] = [0, np.sin(np.pi / 4), 0, np.cos(np.pi / 4)]
    out = process_eef(eef_states, [[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(out[0, 0], [2.0, 2.0, 3.0], atol=1e-6)


def test_dataset_sample_shapes(prep_dir):
    ds = DynDataset(prep_dir, SPEC, phase="train", ratio={"train": [0, 0.75], "valid": [0.75, 1]})
    assert len(ds) > 0
    rng = np.random.RandomState(0)
    s = ds.sample(0, rng)
    N = SPEC.n_nodes
    assert s["state"].shape == (4, N, 3)
    assert s["action"].shape == (N, 3)
    assert s["state_future"].shape == (3, 40, 3)
    assert s["eef_future"].shape == (2, N, 3)
    assert s["attrs"].shape == (N, 2)
    assert s["state_mask"][40]  # eef slot valid
    assert s["obj_mask"].sum() > 5
    assert 0.0 <= s["physics_param"][0] <= 1.0
    # eef action is the delta between history end and next frame
    assert np.abs(s["action"][40]).sum() > 0


def test_batch_loader(prep_dir):
    ds = DynDataset(prep_dir, SPEC, phase="train", ratio={"train": [0, 0.75], "valid": [0.75, 1]})
    loader = BatchLoader(ds, batch_size=4, seed=0)
    b = next(loader)
    assert b["state"].shape == (4, 4, SPEC.n_nodes, 3)
    assert b["adj_thresh"].shape == (4,)
    loader.close()


def test_engine_timers():
    """Per-stage solver timers (parity with NvFlexGetTimers,
    reference: pyflex.cpp:3557-3583)."""
    from adaptigraph_tpu.sim.engine import XPBDScene

    s = XPBDScene("rope", np.asarray([30, 2.0, 0.1, 0.5, 0.3, 0.0, 0.0, 0.0],
                                     np.float32), seed=1)
    for _ in range(3):
        s.step()
    t = s.get_timers()
    assert t["frames"] == 3
    assert t["constraints"] > 0.0
    assert all(v >= 0.0 for k, v in t.items() if k != "frames")


def test_training_with_rest_state(tmp_path):
    """The softbody-config training path: n_his=5, store_rest_state — the
    history keeps the pinned rest frame through the n_future splice
    (reference: softbody.yaml:14-16, train.py:111-115)."""
    import optax

    sim_dir, prep = str(tmp_path / "sim"), str(tmp_path / "prep")
    gen_rope_dataset(sim_dir, n_episodes=3, n_pushes=2, seed=3, n_particles=30)
    n = preprocess(sim_dir, prep, SYNTH_EEF_OFFSETS, n_his=5, n_future=2,
                   dist_thresh=0.1, phys_param_specs=PHYS_SPECS,
                   store_rest_state=True)
    assert n == 3
    import dataclasses

    spec = dataclasses.replace(SPEC, n_his=5, n_future=2, store_rest_state=True)
    ds = DynDataset(prep, spec, phase="train", ratio={"train": [0, 1.0], "valid": [0, 1.0]})
    s = ds.sample(0, np.random.RandomState(0))
    assert s["state"].shape == (5, spec.n_nodes, 3)
    loader = BatchLoader(ds, batch_size=4, seed=0)
    gnn_cfg = GNNConfig(n_his=5, max_nobj=40, max_neef=1, nf_particle=16,
                        nf_relation=16, nf_effect=16, pstep=2)
    edge_cfg = EdgeConfig(max_nobj=40, max_neef=1, topk=5)
    hyper = train_mod.TrainHyper(n_future=2, state_noise_train=0.01,
                                 store_rest_state=True)
    params = init_params(jax.random.PRNGKey(0), gnn_cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = train_mod.make_train_step(gnn_cfg, edge_cfg, hyper, opt)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(10):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, next(loader), k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    loader.close()


def test_batch_loader_mp_workers(prep_dir):
    ds = DynDataset(prep_dir, SPEC, phase="train", ratio={"train": [0, 0.75], "valid": [0.75, 1]})
    loader = BatchLoader(ds, batch_size=4, seed=0, num_workers=2)
    for _ in range(3):
        b = next(loader)
        assert b["state"].shape == (4, 4, SPEC.n_nodes, 3)
        assert np.isfinite(b["state"]).all()
    loader.close()


def test_training_loss_decreases(prep_dir):
    ds = DynDataset(prep_dir, SPEC, phase="train", ratio={"train": [0, 1.0], "valid": [0, 1.0]})
    loader = BatchLoader(ds, batch_size=8, seed=1)
    gnn_cfg = GNNConfig(n_his=4, max_nobj=40, max_neef=1, nf_particle=32, nf_relation=32,
                        nf_effect=32, pstep=2)
    edge_cfg = EdgeConfig(max_nobj=40, max_neef=1, topk=10)
    hyper = train_mod.TrainHyper(n_future=3, state_noise_train=0.01)

    import optax

    params = init_params(jax.random.PRNGKey(0), gnn_cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = train_mod.make_train_step(gnn_cfg, edge_cfg, hyper, opt)

    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(40):
        batch = next(loader)
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batch, k)
        losses.append(float(loss))
    loader.close()
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:5]), losses


def test_checkpoint_roundtrip(tmp_path):
    from adaptigraph_tpu.utils.checkpoint import save_pytree, load_pytree

    gnn_cfg = GNNConfig(nf_particle=16, nf_relation=16, nf_effect=16)
    params = init_params(jax.random.PRNGKey(0), gnn_cfg)
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, params)
    loaded = load_pytree(path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), params, loaded
    )


def test_filter_flags_artifacts(tmp_path):
    """Inject a drifted push and a NaN push; the filter must flag exactly
    those (reference: filter_sim_data.py drift rule)."""
    import json

    from adaptigraph_tpu.sim import io as sim_io
    from adaptigraph_tpu.sim.filter import filter_dataset, load_filter_file

    epi = tmp_path / "000000"
    epi.mkdir()
    rng = np.random.RandomState(0)
    rest = rng.randn(30, 3).astype(np.float32) * 0.1
    # smooth small motion across frames (a real push displaces gradually)
    base = rest[None] + np.linspace(0, 0.05, 4)[:, None, None].astype(np.float32)
    eef = np.zeros((4, 1, 14), np.float32)
    # push 1: clean
    sim_io.store_episode_step(str(epi / "00.h5"), base, eef, np.zeros(4))
    # push 2: drifted (penultimate frame far from rest)
    drifted = base.copy()
    drifted[-2] += 5.0
    sim_io.store_episode_step(str(epi / "01.h5"), drifted, eef, np.zeros(4))
    # push 3: NaN
    bad = base.copy()
    bad[1, 0, 0] = np.nan
    sim_io.store_episode_step(str(epi / "02.h5"), bad, eef, np.zeros(4))
    sim_io.store_properties(str(epi), {"stiffness": 0.5})

    res = filter_dataset(str(tmp_path))
    assert res == {"000000": [2, 3]}
    ff = load_filter_file(str(tmp_path / "filter_artifacts.json"))
    assert ff == {"000000": [2, 3]}


def test_box2d_sim(tmp_path):
    """2D box pushing: the pusher must displace the box, off-center COM must
    rotate it, and the episode writer must produce the keypoint schema."""
    from adaptigraph_tpu.sim.box2d import BoxSim, gen_box_episode

    sim = BoxSim(100.0, 60.0, center_of_mass=(20.0, 0.0))
    c0 = sim.get_corners().copy()
    sim.set_pusher(np.array([25.0, 80.0]))  # off the COM axis -> torque
    for t in range(30):
        sim.update(np.array([25.0, 80.0 - 3.0 * t]))
    c1 = sim.get_corners()
    assert np.abs(c1 - c0).max() > 1.0  # pushed
    assert abs(sim.theta) > 1e-3  # off-center COM rotates

    corners, states = gen_box_episode(str(tmp_path), 0, n_steps=40)
    assert corners.shape == (40, 4, 2)
    assert np.isfinite(corners).all()
    import os
    assert os.path.exists(tmp_path / "000000.npz")


@pytest.mark.parametrize("material", ["multiobj", "bunnybath"])
def test_new_scene_families(material):
    """multiobj (rigid bodies) and bunnybath (PBF fluid + rigid body):
    finite, push-responsive, and no blow-ups."""
    from adaptigraph_tpu.sim.env import PushEnv

    env = PushEnv(material, seed=0)
    p0 = env.reset()
    assert np.isfinite(p0).all()
    pos, eef = env.execute_push(env.sample_push())
    assert np.isfinite(pos).all()
    assert np.abs(pos[-1] - p0).mean() > 1e-3  # the push moved something
    assert pos[-1][:, 1].max() < 3.0  # nothing exploded upward


def test_bunnybath_fluid_settles():
    """The fluid block must stay bounded by the tank walls."""
    from adaptigraph_tpu.sim.engine import XPBDScene

    sc = XPBDScene("bunnybath", [8, 4, 8, 0.1, 0.3, 0.7, 0.7, 0.0], seed=1)
    import numpy as _np

    for _ in range(40):
        sc.step(_np.zeros((0, 3), _np.float32))
    p = sc.get_positions()
    assert _np.isfinite(p).all()
    assert _np.abs(p[:, 0]).max() <= 0.71 and _np.abs(p[:, 2]).max() <= 0.71
    assert p[:, 1].min() > 0.0 and p[:, 1].max() < 1.5


def test_train_resume_restores_optimizer(prep_dir, tmp_path):
    """resume=True must restore params and optimizer state and keep training."""
    from adaptigraph_tpu.dynamics.dataset import DynDataset, BatchLoader
    from adaptigraph_tpu.dynamics.train import TrainHyper, train
    from adaptigraph_tpu.utils.checkpoint import load_checkpoint

    gnn_cfg = GNNConfig(n_his=4, max_nobj=40, max_neef=1, nf_particle=16,
                        nf_relation=16, nf_effect=16, pstep=2)
    edge_cfg = EdgeConfig(max_nobj=40, max_neef=1, topk=10)
    hyper = TrainHyper(n_future=3, batch_size=4, n_epochs=1, n_iters_train=2,
                       n_iters_valid=1)
    out = str(tmp_path / "run")
    ratio = {"train": [0, 1.0], "valid": [0, 1.0]}
    tr = BatchLoader(DynDataset(prep_dir, SPEC, "train", ratio), 4)
    va = BatchLoader(DynDataset(prep_dir, SPEC, "valid", ratio), 4)
    p1, _ = train(gnn_cfg, edge_cfg, hyper, tr, va, out)
    p2, _ = train(gnn_cfg, edge_cfg, hyper, tr, va, out, resume=True)
    tr.close(); va.close()
    # resumed run starts from p1, not a fresh init
    a = jax.tree_util.tree_leaves(p1)[0]
    b = jax.tree_util.tree_leaves(load_checkpoint(out))[0]
    assert np.isfinite(np.asarray(b)).all()


def test_sharded_train_step_matches_single(prep_dir):
    """One train step on an 8-device mesh must produce the same loss and
    parameters as single-device execution (batch sharding is pure DP)."""
    import optax

    from adaptigraph_tpu.dynamics.dataset import BatchLoader, DynDataset
    from adaptigraph_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    gnn_cfg = GNNConfig(n_his=4, max_nobj=40, max_neef=1, nf_particle=16,
                        nf_relation=16, nf_effect=16, pstep=2)
    edge_cfg = EdgeConfig(max_nobj=40, max_neef=1, topk=10)
    hyper = train_mod.TrainHyper(n_future=3, use_augmentation=False)
    ds = DynDataset(prep_dir, SPEC, phase="train",
                    ratio={"train": [0, 1.0], "valid": [0, 1.0]})
    loader = BatchLoader(ds, batch_size=8, seed=3)
    batch = next(loader)
    loader.close()

    params = init_params(jax.random.PRNGKey(0), gnn_cfg)
    opt = optax.adam(1e-3)
    step = train_mod.make_train_step(gnn_cfg, edge_cfg, hyper, opt)
    key = jax.random.PRNGKey(7)

    p1, _, loss1 = step(params, opt.init(params), batch, key)

    # params/opt_state are donated by the train step; rebuild identical ones
    params2 = init_params(jax.random.PRNGKey(0), gnn_cfg)
    mesh = make_mesh(8)
    params_r = replicate(params2, mesh)
    opt_r = replicate(opt.init(params2), mesh)
    batch_s = shard_batch(batch, mesh)
    p8, _, loss8 = step(params_r, opt_r, batch_s, key)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    a = jax.tree_util.tree_leaves(p1)[0]
    b = jax.tree_util.tree_leaves(p8)[0]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)


def test_mesh_voxelize_and_softbody():
    """Mesh -> solid voxel fill -> shape-matching soft body in the engine
    (the reference's core/voxelize + CreateSoftBody path)."""
    from adaptigraph_tpu.sim.engine import XPBDScene
    from adaptigraph_tpu.sim.meshutil import box_mesh, voxelize

    verts, faces = box_mesh(size=(0.6, 0.4, 0.5), center=(0, 0.35, 0))
    pts = voxelize(verts, faces, spacing=0.08)
    expected = (0.6 * 0.4 * 0.5) / 0.08**3
    assert 0.7 * expected < len(pts) < 1.3 * expected
    # all inside the box
    assert np.all(np.abs(pts[:, 0]) <= 0.31)
    assert np.all((pts[:, 1] >= 0.14) & (pts[:, 1] <= 0.56))

    sc = XPBDScene.from_points(pts, spacing=0.08, stiffness=0.7, fixed_frac=0.1)
    assert (sc.get_inv_mass() == 0).sum() > 0  # fixed bottom layer
    p0 = sc.get_positions().copy()
    for _ in range(20):
        sc.step(np.zeros((0, 3), np.float32))
    p1 = sc.get_positions()
    assert np.isfinite(p1).all()
    assert np.abs(p1 - p0).mean() < 0.05  # stable, holds its shape


def test_datagen_with_depth_capture(tmp_path):
    """Opt-in multi-camera depth capture lands in the h5 observations group
    with per-episode camera parameters (the reference's 4-cam capture)."""
    from adaptigraph_tpu.sim import io as sim_io
    from adaptigraph_tpu.sim.datagen import generate

    generate(str(tmp_path), "rope", 1, n_pushes=1, seed=0, capture_depth=True)
    epi = tmp_path / "000000"
    data = sim_io.load_episode_step(str(epi / "01.h5"))
    assert "observations" in data
    depth = data["observations"]["depth"]["cam_0"]
    assert depth.ndim == 3 and np.isfinite(depth).all()
    assert depth.shape[0] == data["positions"].shape[0]
    color = data["observations"]["color"]["cam_0"]
    assert color.shape == depth.shape + (3,) and color.dtype == np.uint8
    # the rendered object is visible: some pixels differ from the background
    assert len(np.unique(color.reshape(-1, 3), axis=0)) > 10
    inst = data["particle_2_instance"]
    assert inst.shape == (data["positions"].shape[1],)
    cams = np.load(epi / "cameras.npz")
    assert cams["intr"].shape == (4, 4) and cams["R"].shape == (4, 3, 3)


def test_instance_map_per_material():
    """particle_2_instance (reference: pyflex_get_particle_2_obj_instance,
    pyflex.cpp:2926): multiobj tags each body, granular each grain,
    bunnybath separates fluid (0) from the floating body (1)."""
    from adaptigraph_tpu.sim.env import PushEnv

    env = PushEnv("multiobj", seed=4)
    env.reset()
    inst = env.scene.get_instance()
    assert inst.min() == 0 and inst.max() >= 2  # >= 3 objects sampled

    env = PushEnv("bunnybath", seed=4)
    env.reset()
    inst = env.scene.get_instance()
    fluid = env.scene.fluid_mask()
    assert (inst[fluid] == 0).all() and (inst[~fluid] == 1).all()

    env = PushEnv("granular", seed=4)
    env.reset()
    inst = env.scene.get_instance()
    assert len(np.unique(inst)) == env.scene.n_particles


@pytest.mark.parametrize("material", ["cloth", "multiobj"])
def test_grasp_action_carries_boundary_point(material):
    """Grasp actions (reference: flex_env.py:997 sample_grasp_actions_corner
    + gripper pick flex_env.py:389-471): the grasped boundary particle must
    end up near the action endpoint, and mass must be restored afterwards."""
    from adaptigraph_tpu.sim.env import PushEnv

    env = PushEnv(material, seed=5)
    env.reset()
    kind, action = env.sample_action()
    assert kind == "grasp"
    before = env.get_positions()
    pos, eef = env.execute_action(kind, action)
    assert np.isfinite(pos).all()
    assert env._n_grasped > 0
    # the object moved toward the endpoint: min distance from the endpoint to
    # any particle shrank
    end = np.asarray([action[2], action[3]])
    d0 = np.min(np.linalg.norm(before[:, [0, 2]] - end, axis=1))
    d1 = np.min(np.linalg.norm(pos[-1][:, [0, 2]] - end, axis=1))
    assert d1 < d0
    # the grasp lifted particles off the table mid-trajectory
    assert pos[:, :, 1].max() > before[:, 1].max() + 0.2
    # release restored every particle's mass (nothing left pinned in the air)
    movable = ~env.get_fixed_mask()
    fluid = env.scene.fluid_mask()
    assert (env.scene.get_inv_mass()[~fluid] > 0).sum() >= movable[~fluid].sum()


def test_poke_action_deforms_softbody():
    """Top-down pokes (reference: flex_env.py:784 sample_top_down_deform
    _actions): the poked region must deform downward while the tool holds."""
    from adaptigraph_tpu.sim.env import PushEnv

    env = PushEnv("softbody", seed=11)
    env.reset()
    action = env.sample_poke()
    before = env.get_positions()
    pos, eef = env.execute_poke(action)
    assert np.isfinite(pos).all()
    # particles near the poke axis dipped below their rest height at some
    # point during the poke
    xz = np.asarray([action[0], action[1]])
    near = np.linalg.norm(before[:, [0, 2]] - xz, axis=1) < 0.2
    assert near.any()
    dip = (before[near, 1][None] - pos[:, near, 1]).max()
    assert dip > 0.02, dip
    # eef keypoints actually moved vertically (poke is a y-axis action)
    assert eef[:, 0, 1].max() - eef[:, 0, 1].min() > 0.1


def test_rigid_debris_material():
    """'rigid' material (reference: flex_scene.py:32-35 -> debris.h +
    scenes.py:363 rigid_scene): many small fully-rigid pieces, pushed with
    the 5-point board."""
    from adaptigraph_tpu.sim.env import PushEnv

    env = PushEnv("rigid", seed=1)
    p0 = env.reset()
    assert env.scene.get_instance().max() >= 5  # >= 6 pieces
    kind, a = env.sample_action()
    assert kind == "push"
    pos, eef = env.execute_action(kind, a)
    assert np.isfinite(pos).all()
    assert np.abs(pos[-1] - p0).mean() > 1e-3
    assert eef.shape[1] == 1 and eef.shape[2] == 14


def test_robot_driven_push_follows_ik_waypoints():
    """datagen --robot (reference: flex_env.py:308-481 + robot_env.py): the
    push executes through the xArm6 IK chain — the realized FK eef trace
    must track the Cartesian waypoints, the tool's contact face must move
    the object, and the recorded eef states must be the FK positions."""
    from adaptigraph_tpu.sim.env import PushEnv

    env = PushEnv("rope", seed=0, robot=True)
    env.reset()
    before = env.get_positions()
    pos, eef = env.execute_push(np.array([-1.2, 0.0, 0.6, 0.2], np.float32))
    assert np.isfinite(pos).all()
    assert env.push_moved_object(before, pos)

    wp, fk = env.last_robot_trace
    # DLS IK converges to sub-mm on every waypoint (robot frame, meters)
    assert np.linalg.norm(wp - fk, axis=1).max() < 1e-3
    # recorded eef positions are realized FK positions mapped back to sim
    fk_sim = np.stack([env._robot_to_sim(p) for p in fk])  # (W, 3) x,z,y
    eef_xyz = eef[:, 0, 0:3]  # [x, y, z]
    for e in eef_xyz:
        d = np.linalg.norm(fk_sim - np.array([e[0], e[2], e[1]]), axis=1)
        assert d.min() < 1e-2
    # arm warm start persists across pushes
    assert env.arm_q is not None


def test_robot_datagen_episode(tmp_path):
    """One --robot episode end-to-end: h5 schema intact, preprocessable."""
    from adaptigraph_tpu.sim.datagen import gen_episode

    epi, n, bad = gen_episode(str(tmp_path), "rope", 0, n_pushes=1, seed=0,
                              robot=True)
    assert not bad and n == 1
    import os
    assert os.path.exists(tmp_path / "000000" / "01.h5")


def test_grad_clip_bounds_update(prep_dir):
    """grad_clip_norm > 0 chains a global-norm clip before Adam (round-4
    robustness knob: one catastrophic granular_f6 epoch blew train loss
    0.0015 -> 2.99); the clipped step must stay finite AND the config knob
    must flow through _dyn_objects."""
    from adaptigraph_tpu.cli import _dyn_objects
    from adaptigraph_tpu.utils.config import load_dynamics_config

    cfg = load_dynamics_config("rope")
    cfg["train_config"]["grad_clip_norm"] = 1.0
    _, _, _, hyper = _dyn_objects(cfg)
    assert hyper.grad_clip_norm == 1.0

    import optax

    ds = DynDataset(prep_dir, SPEC, phase="train",
                    ratio={"train": [0, 1.0], "valid": [0, 1.0]})
    loader = BatchLoader(ds, batch_size=8, seed=1)
    gnn_cfg = GNNConfig(n_his=4, max_nobj=40, max_neef=1, nf_particle=32,
                        nf_relation=32, nf_effect=32, pstep=2)
    edge_cfg = EdgeConfig(max_nobj=40, max_neef=1, topk=10)
    hyper2 = train_mod.TrainHyper(n_future=3, state_noise_train=0.01,
                                  grad_clip_norm=1.0)
    # the same chain train() builds when the knob is set
    opt = optax.chain(optax.clip_by_global_norm(hyper2.grad_clip_norm),
                      optax.adam(hyper2.lr))
    params = init_params(jax.random.PRNGKey(0), gnn_cfg)
    opt_state = opt.init(params)
    step = train_mod.make_train_step(gnn_cfg, edge_cfg, hyper2, opt)
    key = jax.random.PRNGKey(0)
    # the train step donates params; snapshot to host first
    p0 = jax.tree_util.tree_map(np.asarray, params)
    for _ in range(3):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, next(loader), k)
        assert np.isfinite(float(loss))
    loader.close()
    # clipped Adam still moves the params
    import jax.numpy as jnp

    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b[0] - b[1]).sum()),
        jax.tree_util.tree_map(lambda a, b: (a, b), p0, params), 0.0)
    assert diff > 0.0
