"""Command-line entry points.

Mirrors the reference's argparse mains (reference: SURVEY.md §1 entry
points — ``src/sim/data_gen/data_gen.py:175``, ``src/dynamics/preprocess/
preprocess.py:364``, ``src/dynamics/train/train.py:164``, ``src/dynamics/
rollout/rollout.py:516``, ``src/planning/plan.py:341``,
``src/planning/random_interact.py:298``, ``src/planning/demo/
demo_granular_1.py:13``) as one ``python -m adaptigraph_tpu`` tool with
subcommands::

    python -m adaptigraph_tpu datagen  --material rope --data_dir data/sim/rope
    python -m adaptigraph_tpu preprocess --config rope
    python -m adaptigraph_tpu train      --config rope
    python -m adaptigraph_tpu rollout    --config rope --out_dir runs/rope
    python -m adaptigraph_tpu plan       --config rope --save_dir runs/plan
    python -m adaptigraph_tpu random-interact --config rope
    python -m adaptigraph_tpu demo-ppo   --config granular --load_dir fixtures/
"""

import argparse
import json
import os

import numpy as np

# Gate for the axon hard-exit teardown workaround at the end of main():
# False for in-process callers (tests), True only via console_main().
_ALLOW_HARD_EXIT = False


# ---------------------------------------------------------------------------
# config -> framework objects
# ---------------------------------------------------------------------------

def _dyn_objects(config):
    """dynamics config dict -> (spec, gnn_cfg, edge_cfg, hyper)."""
    from adaptigraph_tpu.dynamics.dataset import spec_from_config
    from adaptigraph_tpu.dynamics.train import TrainHyper
    from adaptigraph_tpu.models.gnn import model_config_from_yaml
    from adaptigraph_tpu.ops.graph import EdgeConfig

    spec = spec_from_config(config)
    gnn_cfg = model_config_from_yaml(config)
    ds = config["dataset_config"]["datasets"][0]
    if ds.get("connect_tool_all_non_fixed"):
        policy = "non_fixed"
    elif ds.get("connect_tool_all"):
        policy = "tools_all"
    elif ds.get("connect_tools_surface") or ds.get("connect_tool_surface"):
        # both spellings: the reference configs say connect_tool_surface
        # (config/dynamics/softbody.yaml:81), its code connect_tools_surface
        policy = "surface"
    else:
        policy = "none"
    edge_cfg = EdgeConfig(
        max_nobj=spec.max_nobj, max_neef=spec.max_neef, topk=spec.topk,
        policy=policy,
        surface_ratio=float(ds.get("connect_tool_surface_ratio", 1.0)),
    )
    tc = config["train_config"]
    rand = config["dataset_config"].get("randomness", {})
    # n_iters_per_epoch is a {train, valid} dict in the config yamls
    # (mirroring the reference's n_iters_per_epoch section); accept a plain
    # int too
    ipe = tc.get("n_iters_per_epoch", 1000)
    if isinstance(ipe, dict):
        n_it_train = int(ipe.get("train", 1000))
        n_it_valid = int(ipe.get("valid", 100))
    else:
        n_it_train = int(ipe)
        n_it_valid = int(tc.get("n_iters_per_epoch_valid", 100))
    hyper = TrainHyper(
        n_future=spec.n_future,
        batch_size=tc.get("batch_size", 128),
        n_epochs=tc.get("n_epochs", 100),
        n_iters_train=n_it_train,
        n_iters_valid=n_it_valid,
        lr=float(tc.get("lr", 1e-3)),
        use_augmentation=rand.get("use", True),
        state_noise_train=rand.get("state_noise", {}).get("train", 0.05),
        state_noise_valid=rand.get("state_noise", {}).get("valid", 0.0),
        store_rest_state=spec.store_rest_state,
        grad_clip_norm=float(tc.get("grad_clip_norm", 0.0)),
    )
    return spec, gnn_cfg, edge_cfg, hyper


def _task_objects(task):
    """planning task config -> (TaskConfig, dynamics config objects)."""
    from adaptigraph_tpu.planning.closed_loop import TaskConfig
    from adaptigraph_tpu.planning.forward import DynamicsConfig
    from adaptigraph_tpu.planning.mppi_solve import MPPIConfig

    config = task["_dynamics_config"]
    spec, gnn_cfg, edge_cfg, _ = _dyn_objects(config)
    if edge_cfg.policy == "tools_all":
        # planning uses the reference's BATCHED tools_all semantics, which
        # gate the tool connections per sample on radius∧topk contact
        # (reference: graph.py:276-286); the ungated single version is the
        # training-data path (graph.py:119-123)
        import dataclasses as _dc

        edge_cfg = _dc.replace(edge_cfg, gate_on_contact=True)
    dcfg = DynamicsConfig(
        gnn=gnn_cfg, edge=edge_cfg, n_his=task.get("n_his", spec.n_his),
        push_length=task.get("push_length", 0.1),
        sim_real_ratio=task.get("sim_real_ratio", 10.0),
        max_repeat=int(np.ceil(task["action_upper_lim"][3])),
        pusher_offsets=tuple(task.get("pusher_points", [])) or (),
        gripper_enable=task.get("gripper_enable", False),
        adj_thresh=task.get("adj_thresh", 0.5),
    )
    mcfg = MPPIConfig(
        n_sample=task.get("n_sample", 20000),
        n_sample_chunk=task.get("n_sample_chunk", 2000),
        n_look_ahead=task.get("n_look_ahead", 1),
        n_update_iter=task.get("n_update_iter", 1),
        reward_weight=task.get("reward_weight", 500.0),
        noise_level=task.get("noise_level", 1.0),
        push_length=task.get("push_length", 0.1),
    )
    tcfg = TaskConfig(
        dcfg=dcfg, mcfg=mcfg,
        action_lower_lim=np.asarray(task["action_lower_lim"], np.float32),
        action_upper_lim=np.asarray(task["action_upper_lim"], np.float32),
        n_actions=task.get("n_actions", 10),
        penalty_type=task.get("penalty_type", "none"),
        target_type=task.get("target_type", "pcd"),
        fps_radius=task.get("fps_radius", 0.2),
        sim_real_ratio=task.get("sim_real_ratio", 10.0),
        k_filter=task.get("k_filter", 1.0),
        obj_list=tuple(task.get("obj_list", [])),
        max_n=task.get("max_n", 1),
        target_path=task.get("target", None),
        clipping_height=task.get("clipping_height", None),
        rotate_pusher=task.get("rotate_pusher", False),
        # board-frame [x_min, x_max, z_min, z_max, ...] -> sim-frame (2, 2)
        # x/z bounds for the workspace exp-penalty (reference: plan.py:44-56)
        workspace_bbox=(
            np.asarray(task["bbox"][:4], np.float32).reshape(2, 2)
            * task.get("sim_real_ratio", 10.0)
            if task.get("bbox") is not None else None),
        # the Pallas kernel is TPU-only; XLA path elsewhere (CPU smoke runs)
        use_fused=task.get("use_fused", _default_backend() == "tpu"),
    )
    return tcfg, config


def _default_backend():
    import jax

    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


def _phys_specs(config):
    material = config["dataset_config"]["materials"][0]
    return config["material_config"][material]["physics_params"]


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------

def cmd_datagen(args):
    if args.config:
        from adaptigraph_tpu.utils.config import config_dir, load_yaml

        path = args.config if os.path.exists(args.config) else os.path.join(
            config_dir(), "data_gen", f"{args.config}.yaml")
        ds = load_yaml(path)["dataset"]
        material = args.material or ds["obj"]
        data_dir = args.data_dir or ds["data_dir"]
        n_episodes = args.n_episodes or ds["n_episode"]
        n_pushes = args.n_pushes or ds.get("n_timestep", 5)
        n_workers = args.n_workers or ds.get("n_worker", 1)
        seed = ds.get("seed", 0) if args.seed is None else args.seed
    else:
        material, data_dir = args.material, args.data_dir
        n_episodes, n_pushes = args.n_episodes or 10, args.n_pushes or 5
        n_workers, seed = args.n_workers or 1, args.seed or 0
    assert material and data_dir, "need --material/--data_dir or --config"

    if material == "box":
        from adaptigraph_tpu.sim.box2d import gen_box_data

        gen_box_data(data_dir, n_episodes, seed=seed)
        print(f"generated {n_episodes} box episodes -> {data_dir}")
        return
    from adaptigraph_tpu.sim.datagen import generate

    bad = generate(data_dir, material, n_episodes, n_pushes=n_pushes,
                   n_workers=n_workers, seed=seed, capture_depth=args.capture,
                   robot=args.robot, start_episode=args.start_episode)
    print(f"generated {n_episodes} episodes ({len(bad)} bad) -> {data_dir}")


def cmd_preprocess(args):
    from adaptigraph_tpu.dynamics.preprocess import preprocess
    from adaptigraph_tpu.utils.config import load_dynamics_config

    config = load_dynamics_config(args.config)
    dc = config["dataset_config"]
    data_dir = args.data_dir or os.path.join(dc["data_dir"], dc["data_name"])
    prep_dir = args.prep_dir or os.path.join(dc["prep_data_dir"], dc["data_name"])
    filter_actions = None
    if args.filter_file:
        from adaptigraph_tpu.sim.filter import load_filter_file

        filter_actions = load_filter_file(args.filter_file)
    n = preprocess(
        data_dir, prep_dir, np.asarray(dc["eef"]["pos"], np.float32),
        dc["n_his"], dc["n_future"], dc["dist_thresh"], _phys_specs(config),
        store_rest_state=dc.get("store_rest_state", False),
        filter_actions=filter_actions,
    )
    print(f"preprocessed {n} episodes -> {prep_dir}")


def cmd_filter(args):
    """Scan sim episodes for artifacts (reference:
    src/dynamics/preprocess/filter_sim_data.py): drift of the rest state,
    NaNs, frame-to-frame spikes; writes a json consumed by
    ``preprocess --filter_file``."""
    from adaptigraph_tpu.sim.filter import filter_dataset

    res = filter_dataset(args.data_dir, out_file=args.out,
                         drift_thresh=args.drift_thresh,
                         spike_thresh=args.spike_thresh)
    n_flagged = sum(len(v) for v in res.values())
    print(f"flagged {n_flagged} pushes across {len(res)} episodes")


def cmd_train(args):
    import jax

    from adaptigraph_tpu.dynamics.dataset import BatchLoader, DynDataset
    from adaptigraph_tpu.dynamics.train import train
    from adaptigraph_tpu.utils.config import load_dynamics_config

    config = load_dynamics_config(args.config)
    spec, gnn_cfg, edge_cfg, hyper = _dyn_objects(config)
    import dataclasses
    over = {}
    if args.epochs:
        over["n_epochs"] = args.epochs
    if args.iters:
        over["n_iters_train"] = args.iters
        over["n_iters_valid"] = max(1, args.iters // 10)
    if args.batch_size:
        over["batch_size"] = args.batch_size
    if over:
        hyper = dataclasses.replace(hyper, **over)
    dc = config["dataset_config"]
    prep_dir = args.prep_dir or os.path.join(dc["prep_data_dir"], dc["data_name"])
    out_dir = args.out_dir or config["train_config"]["out_dir"]
    ratio = dc["ratio"]
    K = max(1, args.steps_per_call)
    if args.slow_loader:
        # per-sample assembly path (the reference's DataLoader(num_workers=8)
        # analog, train.py:48-53); kept for A/B debugging
        nw = args.num_workers
        tr = BatchLoader(DynDataset(prep_dir, spec, "train", ratio), hyper.batch_size,
                         num_workers=nw, stack_steps=K)
        va = BatchLoader(DynDataset(prep_dir, spec, "valid", ratio), hyper.batch_size,
                         num_workers=max(2, nw // 2) if nw else 0, stack_steps=K)
    else:
        from adaptigraph_tpu.dynamics.dataset import PackedDataset

        tr = BatchLoader(PackedDataset(prep_dir, spec, "train", ratio, compact=True),
                         hyper.batch_size, stack_steps=K)
        va = BatchLoader(PackedDataset(prep_dir, spec, "valid", ratio, compact=True),
                         hyper.batch_size, stack_steps=K)

    mesh = None
    if args.n_devices > 1:
        from adaptigraph_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.n_devices)
    params, curves = train(gnn_cfg, edge_cfg, hyper, tr, va, out_dir, mesh=mesh,
                           resume=args.resume)
    print(f"trained: final valid loss {curves['valid'][-1]:.6f} -> {out_dir}")


def cmd_rollout(args):
    from adaptigraph_tpu.dynamics.rollout import rollout_dataset
    from adaptigraph_tpu.utils.checkpoint import load_checkpoint
    from adaptigraph_tpu.utils.config import load_dynamics_config

    config = load_dynamics_config(args.config)
    spec, gnn_cfg, edge_cfg, _ = _dyn_objects(config)
    dc = config["dataset_config"]
    prep_dir = args.prep_dir or os.path.join(dc["prep_data_dir"], dc["data_name"])
    out_dir = args.out_dir or config["train_config"]["out_dir"]
    params = load_checkpoint(out_dir, epoch=args.epoch)
    roll_dir = os.path.join(out_dir, "rollout")
    # --eval_frac widens the held-out slice (default 2% ~= 10 pushes at 100
    # episodes); the last-step median is noisy at 10 pushes (round-4
    # analysis), so stability studies evaluate more. The slice is clamped
    # to the config's train-phase end so a wide frac can never silently
    # include TRAINED episodes in a metric documented as held-out (ADVICE
    # r4) — for truly large held-out sets use a fresh prep dir instead.
    frac = 0.02 if args.eval_frac is None else args.eval_frac
    eval_lo = 1.0 - frac
    if args.all_episodes:
        # FRESH prep dirs (never trained on) are evaluated whole
        eval_lo = 0.0
    else:
        train_hi = float(dc.get("ratio", {}).get("train", [0, 0.98])[1])
        if eval_lo < train_hi:
            print(f"warning: --eval_frac {frac} overlaps the train split "
                  f"[0, {train_hi}]; clamping eval slice to [{train_hi}, 1.0]"
                  " (use --all_episodes for a fresh prep dir)")
            eval_lo = train_hi
    stats = rollout_dataset(params, spec, gnn_cfg, edge_cfg, prep_dir,
                            phase_ratio=(eval_lo, 1.0),
                            out_dir=roll_dir, keep_prev_fps=args.keep_prev_fps)
    med = stats["median"]
    if len(med):
        from adaptigraph_tpu.utils.viz import plot_error_curves

        plot_error_curves(stats, os.path.join(roll_dir, "error_median_iqr.png"))
    # machine-readable aggregate for campaign drivers / README tables
    # (reference analog: the median/IQR aggregate plot, rollout.py:438-467)
    per_push = stats.get("per_push", [])
    summary = {
        "n_pushes": len(per_push),
        "median_last_step": float(med[-1]) if len(med) else None,
        "median_mean": float(np.mean(med)) if len(med) else None,
        "push_final_median": (float(np.median([e[-1] for e in per_push if len(e)]))
                              if per_push else None),
    }
    # strict JSON: degenerate rollouts can yield NaN medians, and a bare NaN
    # token breaks non-Python consumers of the machine-readable summary
    summary = {k: (None if isinstance(v, float) and not np.isfinite(v) else v)
               for k, v in summary.items()}
    with open(os.path.join(roll_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(f"rollout: {len(per_push)} pushes, "
          f"median error @last step {med[-1] if len(med) else float('nan'):.5f}")


def _load_plan_params(args, tcfg):
    import jax

    from adaptigraph_tpu.models.gnn import init_params
    from adaptigraph_tpu.utils.checkpoint import load_checkpoint

    if args.ckpt_dir:
        return load_checkpoint(args.ckpt_dir, epoch=args.epoch)
    print("WARNING: no --ckpt_dir, using random init (smoke mode)")
    return init_params(jax.random.PRNGKey(0), tcfg.dcfg.gnn)


def cmd_plan(args):
    from adaptigraph_tpu.planning.closed_loop import run_plan
    from adaptigraph_tpu.realworld.env import SimRealEnv
    from adaptigraph_tpu.utils.config import load_planning_config

    task = load_planning_config(args.config)
    tcfg, config = _task_objects(task)
    if args.n_actions:
        tcfg.n_actions = args.n_actions
    if args.verify:
        tcfg.verify_improvement = True
    if args.fps_radius is not None:
        # denser/sparser perceived state; shapes are padded to max_nobj so
        # the compiled solve is reused across radii (0 is a valid probe:
        # FPS keeps every perceived point)
        tcfg.fps_radius = args.fps_radius
    if args.reward_weight is not None:
        import dataclasses as _dc

        # MPPI softmax temperature (reference: planning yaml reward_weight)
        tcfg.mcfg = _dc.replace(tcfg.mcfg, reward_weight=args.reward_weight)
    if args.n_sample or args.n_sample_chunk:
        import dataclasses

        n_sample = args.n_sample or tcfg.mcfg.n_sample
        chunk = args.n_sample_chunk or min(n_sample, tcfg.mcfg.n_sample_chunk)
        if n_sample % chunk:  # the fused solve needs chunk | n_sample
            chunk = next(c for c in range(min(chunk, n_sample), 0, -1)
                         if n_sample % c == 0)
        tcfg.mcfg = dataclasses.replace(tcfg.mcfg, n_sample=n_sample,
                                        n_sample_chunk=chunk)
    material = config["dataset_config"]["materials"][0]
    env = SimRealEnv(material, seed=args.seed, sim_real_ratio=tcfg.sim_real_ratio)
    # the scene's TRUE normalized physics parameter (SimRealEnv knows its
    # sampled properties; normalization mirrors the dataset's min/max,
    # reference: load.py:69-82) — recorded in every artifact so estimate
    # accuracy is checkable (VERDICT r4 next #1a)
    props = env.env.properties
    true_phys = np.array(
        [(float(props[s["name"]]) - s["min"]) / (s["max"] - s["min"])
         for s in _phys_specs(config) if s["use"] and s["name"] in props],
        np.float32)
    if true_phys.size != tcfg.dcfg.gnn.phys_dim:
        true_phys = None  # property set doesn't cover the model's param dim
    phys_override = None
    if args.phys is not None:
        phys_override = np.asarray(args.phys, np.float32)
    elif args.oracle:
        assert true_phys is not None, "--oracle needs the scene's true params"
        phys_override = true_phys
    if phys_override is not None:
        args.no_ppo = True  # fixed-parameter arms don't adapt
    params = _load_plan_params(args, tcfg)
    if args.target:  # explicit file beats the yaml target
        target = np.load(args.target)
        target = target[target.files[0]] if hasattr(target, "files") else target
    elif tcfg.target_type == "box" and isinstance(tcfg.target_path, (list, tuple)):
        # board-frame [x_min, x_max, z_min, z_max] -> sim-frame (2, 2)
        # (reference: plan.py:148-153)
        target = np.asarray(tcfg.target_path, np.float32).reshape(2, 2) * tcfg.sim_real_ratio
    elif isinstance(tcfg.target_path, str) and os.path.exists(tcfg.target_path):
        target = np.load(tcfg.target_path)
        target = target[target.files[0]] if hasattr(target, "files") else target
    else:
        # default smoke target: current object translated
        target = env.get_particles_sim() + np.array([0.5, 0.0, 0.3], np.float32)
    if tcfg.target_type != "box" and np.ndim(target) == 2:
        # resample pcd targets to exactly max_nobj points: target shape is
        # baked into the compiled solve, so a FIXED size keeps the program
        # identical across seeds/episodes — one persistent-cache entry
        # instead of a >25-min remote recompile per particle count
        M = tcfg.dcfg.gnn.max_nobj
        if len(target) != M:
            idx = np.random.RandomState(args.seed).choice(
                len(target), M, replace=len(target) < M)
            target = np.asarray(target)[idx]
    from adaptigraph_tpu.realworld.detect import (color_spread_mask_fn,
                                                  make_mask_fn)
    from adaptigraph_tpu.realworld.perception import PerceptionModule

    mask_fn = None
    if args.sim_mask:
        # sim-backed color segmentation: exercises the full non-use_raw
        # perception path (mask_fn + voxel/outlier filters) hardware-free
        mask_fn = color_spread_mask_fn()
        tcfg.use_raw = False
    elif args.learned_perception:
        # GroundingDINO+SAM tier (downloads/loads torch checkpoints on the
        # first perceive; opt-in because weights may be unavailable)
        mask_fn = make_mask_fn(tcfg.obj_list, max_n=tcfg.max_n)
        if mask_fn is None:
            raise SystemExit("--learned_perception needs torch+transformers "
                             "and task obj_list prompts")
        tcfg.use_raw = False
    pm = PerceptionModule(stride=2, k_filter=tcfg.k_filter,
                          obj_prompts=tcfg.obj_list, max_n=tcfg.max_n,
                          mask_fn=mask_fn)
    mesh = None
    if args.mesh:
        import jax

        from adaptigraph_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices()) if args.mesh == "auto" else int(args.mesh)
        if n_dev > 1:
            mesh = make_mesh(n_dev)
            # the sharded solve needs n_chunks % n_devices == 0
            import dataclasses as _dc

            n_chunks = tcfg.mcfg.n_sample // tcfg.mcfg.n_sample_chunk
            if n_chunks % n_dev:
                if tcfg.mcfg.n_sample % n_dev:
                    raise SystemExit(
                        f"n_sample={tcfg.mcfg.n_sample} must be divisible by "
                        f"the device count ({n_dev}) for --mesh; adjust "
                        "n_sample or n_sample_chunk in the task config")
                chunk = tcfg.mcfg.n_sample // (n_dev * max(1, n_chunks // n_dev))
                while chunk > 1 and tcfg.mcfg.n_sample % (chunk * n_dev):
                    chunk -= 1
                tcfg.mcfg = _dc.replace(tcfg.mcfg, n_sample_chunk=chunk)
    hist = run_plan(env, params, tcfg, target, pm=pm, save_dir=args.save_dir,
                    seed=args.seed, use_ppo=not args.no_ppo,
                    resume=args.resume, mesh=mesh, true_phys=true_phys,
                    phys_override=phys_override, ppo_warmup=args.ppo_warmup)
    if args.save_dir:
        from adaptigraph_tpu.utils.viz import plot_planning_progress

        plot_planning_progress(hist["errors"],
                               os.path.join(args.save_dir, "plan_errors.png"))
    print(f"plan done: errors {['%.4f' % e for e in hist['errors']]}")


def cmd_random_interact(args):
    from adaptigraph_tpu.planning.closed_loop import run_random_interact
    from adaptigraph_tpu.realworld.env import SimRealEnv
    from adaptigraph_tpu.utils.config import load_planning_config

    task = load_planning_config(args.config)
    tcfg, config = _task_objects(task)
    material = config["dataset_config"]["materials"][0]
    env = SimRealEnv(material, seed=args.seed, sim_real_ratio=tcfg.sim_real_ratio)
    params = _load_plan_params(args, tcfg)
    from adaptigraph_tpu.realworld.perception import PerceptionModule

    pm = PerceptionModule(stride=2, k_filter=tcfg.k_filter,
                          obj_prompts=tcfg.obj_list, max_n=tcfg.max_n)
    ppo = run_random_interact(env, params, tcfg, pm=pm, save_dir=args.save_dir,
                              seed=args.seed, n_actions=args.n_actions or 20,
                              resume=args.resume)
    est, err, err0 = ppo.optimize(iterations=50)
    print(f"random-interact done: physics estimate {est} (err {err:.5f} <- {err0:.5f})")


def cmd_demo_ppo(args):
    """Replay recorded interaction fixtures through the physics-param
    optimizer (reference: demo_granular_1.py — expected estimate ~0.04 for
    the released granular fixture)."""
    from adaptigraph_tpu.planning.physics_optimizer import PhysicsParamOnlineOptimizer
    from adaptigraph_tpu.utils.config import load_planning_config

    task = load_planning_config(args.config)
    tcfg, _ = _task_objects(task)
    params = _load_plan_params(args, tcfg)
    ppo = PhysicsParamOnlineOptimizer(tcfg.dcfg, params,
                                      phys_dim=tcfg.dcfg.gnn.phys_dim)
    ppo.load_interactions(args.load_dir)
    est, err, err0 = ppo.optimize(iterations=args.iterations)
    print(f"physics estimate: {est} (error {err:.5f} <- init {err0:.5f})")


def cmd_perception(args):
    """Perception utilities (reference: src/planning/perception.py:428-444
    main — --calibrate / --construct_goal). Hardware-free: runs against the
    sim-backed real environment; the RealEnv hardware path is SDK-gated."""
    from adaptigraph_tpu.realworld.env import SimRealEnv
    from adaptigraph_tpu.realworld.perception import (
        PerceptionModule,
        construct_goal_from_perception,
        get_state_cur,
    )

    env = SimRealEnv(material=args.material, seed=args.seed)
    pm = PerceptionModule(stride=2)
    if args.construct_goal:
        goal = construct_goal_from_perception(env, pm)
        np.savez(args.out, goal=goal)
        print(f"captured goal point cloud ({goal.shape[0]} pts) -> {args.out}")
    elif args.calibrate:
        # calibration check: fuse the 4 camera views and compare the
        # perceived state to the simulator ground truth (the reference's
        # calibrate() is ArUco-based and needs hardware; here the extrinsics
        # are exact, so residual error measures the perception stack itself)
        state, _ = get_state_cur(env, pm)
        gt = env.get_particles_sim()
        import jax.numpy as jnp

        from adaptigraph_tpu.ops.costs import chamfer

        err = float(chamfer(jnp.asarray(state), jnp.asarray(gt)))
        print(f"calibration check: {state.shape[0]} perceived keypoints, "
              f"chamfer to ground truth {err:.4f} (sim units)")
    else:
        print("please specify --calibrate or --construct_goal")


def main(argv=None):
    p = argparse.ArgumentParser(prog="adaptigraph_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("datagen", help="generate simulation episodes")
    d.add_argument("--config", help="data_gen config name or path")
    d.add_argument("--material")
    d.add_argument("--data_dir")
    d.add_argument("--n_episodes", type=int)
    d.add_argument("--n_pushes", type=int)
    d.add_argument("--n_workers", type=int)
    d.add_argument("--seed", type=int)
    d.add_argument("--start_episode", type=int, default=0,
                   help="first episode index: extend an existing dataset "
                        "in place (per-episode seeds depend only on the "
                        "base seed and the index, so an extended run "
                        "matches a single longer run)")
    d.add_argument("--capture", action="store_true",
                   help="record 4-camera RGB-D observations per frame")
    d.add_argument("--robot", action="store_true",
                   help="execute pushes through the xArm6 IK chain with the "
                        "tool's contact-face collision geometry (reference: "
                        "flex_env.py:308-481 robot-in-scene data gen)")
    d.set_defaults(fn=cmd_datagen)

    pr = sub.add_parser("preprocess", help="episodes -> training artifacts")
    pr.add_argument("--config", required=True)
    pr.add_argument("--data_dir")
    pr.add_argument("--prep_dir")
    pr.add_argument("--filter_file",
                    help="json from the `filter` subcommand; listed pushes "
                         "are excluded (reference: preprocess.py "
                         "read_in_filter_file)")
    pr.set_defaults(fn=cmd_preprocess)

    fl = sub.add_parser("filter", help="flag sim episodes with solver artifacts")
    fl.add_argument("--data_dir", required=True)
    fl.add_argument("--out")
    fl.add_argument("--drift_thresh", type=float, default=1.0)
    fl.add_argument("--spike_thresh", type=float, default=0.5)
    fl.set_defaults(fn=cmd_filter)

    t = sub.add_parser("train", help="train the GNN dynamics model")
    t.add_argument("--config", required=True)
    t.add_argument("--prep_dir")
    t.add_argument("--out_dir")
    t.add_argument("--epochs", type=int)
    t.add_argument("--iters", type=int, help="train iters per epoch override")
    t.add_argument("--batch_size", type=int)
    t.add_argument("--n_devices", type=int, default=1)
    t.add_argument("--num_workers", type=int, default=4,
                   help="batch-assembly worker processes (reference: "
                        "DataLoader num_workers=8); only with --slow_loader")
    t.add_argument("--steps_per_call", type=int, default=20,
                   help="optimizer steps per device dispatch (stacked "
                        "superbatch + lax.scan; 1 = per-step dispatch)")
    t.add_argument("--slow_loader", action="store_true",
                   help="per-sample batch assembly instead of PackedDataset")
    t.add_argument("--resume", action="store_true",
                   help="restore latest params + optimizer state from out_dir")
    t.set_defaults(fn=cmd_train)

    r = sub.add_parser("rollout", help="autoregressive rollout evaluation")
    r.add_argument("--config", required=True)
    r.add_argument("--prep_dir")
    r.add_argument("--out_dir")
    r.add_argument("--epoch", type=int)
    r.add_argument("--eval_frac", type=float,
                   help="held-out episode fraction to evaluate (default "
                        "0.02; larger = more pushes, stabler medians; "
                        "clamped to the train-split end)")
    r.add_argument("--all_episodes", action="store_true",
                   help="evaluate the WHOLE prep dir (for fresh test sets "
                        "that were never trained on)")
    r.add_argument("--keep_prev_fps", action="store_true",
                   help="reuse the first push's FPS indices for all pushes "
                        "in an episode (reference: rollout.py --keep_prev_fps)")
    r.set_defaults(fn=cmd_rollout)

    pl = sub.add_parser("plan", help="closed-loop MPC on the sim-backed env")
    pl.add_argument("--config", required=True)
    pl.add_argument("--ckpt_dir")
    pl.add_argument("--epoch", type=int)
    pl.add_argument("--target", help="npz/npy target point cloud (sim frame)")
    pl.add_argument("--save_dir")
    pl.add_argument("--n_actions", type=int)
    pl.add_argument("--n_sample", type=int,
                    help="override the MPPI sample budget (smoke runs)")
    pl.add_argument("--n_sample_chunk", type=int)
    pl.add_argument("--seed", type=int, default=0)
    pl.add_argument("--no_ppo", action="store_true")
    pl.add_argument("--verify", action="store_true",
                    help="only execute pushes whose predicted outcome "
                         "improves on the current error (end-game guard; "
                         "re-solves then stops when converged)")
    pl.add_argument("--fps_radius", type=float,
                    help="override the perception FPS radius (sim units); "
                         "smaller = denser perceived keypoints")
    pl.add_argument("--reward_weight", type=float,
                    help="override the MPPI softmax temperature")
    pl.add_argument("--oracle", action="store_true",
                    help="plan with the scene's TRUE physics parameter "
                         "(adaptation A/B oracle arm; implies --no_ppo "
                         "semantics for the parameter)")
    pl.add_argument("--phys", type=float, nargs="+",
                    help="plan with this fixed normalized physics parameter "
                         "(A/B arm; e.g. --phys 0.5)")
    pl.add_argument("--ppo_warmup", type=int, default=0,
                    help="random excitation pushes recorded as PPO "
                         "interactions before the MPC loop (the reference "
                         "runs random_interact first to build the "
                         "system-ID dataset)")
    pl.add_argument("--resume", action="store_true",
                    help="continue from saved step_*.npz in --save_dir "
                         "(reference: plan.py --resume)")
    pl.add_argument("--mesh", help="shard the MPPI sample budget over a "
                                   "device mesh: 'auto' (all devices) or a "
                                   "device count")
    pl.add_argument("--sim_mask", action="store_true",
                    help="perceive through the color-segmentation mask_fn "
                         "path (non-use_raw) against the sim renderer")
    pl.add_argument("--learned_perception", action="store_true",
                    help="GroundingDINO+SAM mask_fn from the task obj_list "
                         "prompts (loads torch checkpoints lazily)")
    pl.set_defaults(fn=cmd_plan)

    ri = sub.add_parser("random-interact", help="exploration for system ID")
    ri.add_argument("--config", required=True)
    ri.add_argument("--ckpt_dir")
    ri.add_argument("--epoch", type=int)
    ri.add_argument("--save_dir")
    ri.add_argument("--n_actions", type=int)
    ri.add_argument("--seed", type=int, default=0)
    ri.add_argument("--resume", action="store_true",
                    help="continue from recorded interaction_*.npz in "
                         "--save_dir (reference: random_interact.py --resume)")
    ri.set_defaults(fn=cmd_random_interact)

    dp = sub.add_parser("demo-ppo", help="physics-param demo on recorded fixtures")
    dp.add_argument("--config", required=True)
    dp.add_argument("--load_dir", required=True)
    dp.add_argument("--ckpt_dir")
    dp.add_argument("--epoch", type=int)
    dp.add_argument("--iterations", type=int, default=50)
    dp.set_defaults(fn=cmd_demo_ppo)

    pc = sub.add_parser("perception", help="goal capture / calibration check")
    pc.add_argument("--construct_goal", action="store_true")
    pc.add_argument("--calibrate", action="store_true")
    pc.add_argument("--material", default="rope")
    pc.add_argument("--seed", type=int, default=0)
    pc.add_argument("--out", default="goal.npz")
    pc.set_defaults(fn=cmd_perception)

    args = p.parse_args(argv)
    # persistent compilation cache for every jax-using subcommand: the 20k-
    # sample plan program compiles >25 min remotely; the disk cache makes it
    # a one-time cost surviving restarts. config.update (not env): the
    # ambient sitecustomize pre-imports jax before this module runs. datagen/
    # preprocess/filter never compile, so skip them (keeps them jax-free in
    # environments without the sitecustomize pre-import).
    if args.cmd not in ("datagen", "preprocess", "filter"):
        from adaptigraph_tpu.utils.jaxcache import enable_persistent_cache

        enable_persistent_cache()
    args.fn(args)
    # On the remote-TPU (axon) backend, interpreter/C++ teardown aborts in
    # static destructors AND leaves the tunnel terminal wedged for the next
    # client (observed: every wedge this round followed a client exit; same
    # signature as the BENCH_r02 rc=134 crash). All command outputs are
    # flushed to disk by this point, so skip teardown entirely — the exact
    # workaround bench.py uses. Env-gated (not jax.default_backend(), which
    # reports "tpu" for axon, and importing jax here would newly dial the
    # tunnel from jax-free subcommands like datagen).
    # The hard exit is process-terminating: it must never fire when main()
    # was called in-process (pytest imports cli and calls main() directly;
    # with the ambient JAX_PLATFORMS=axon it used to kill the whole pytest
    # run after the first CLI test with rc=0 — a silent false success).
    # Only the real process entry points opt in via console_main().
    if _ALLOW_HARD_EXIT and "axon" in os.environ.get("JAX_PLATFORMS", ""):
        # anything needing teardown on this path must use the finalizer
        # registry — atexit never runs after os._exit
        from adaptigraph_tpu.utils.finalize import run_finalizers

        run_finalizers()
        os._exit(0)


def console_main(argv=None):
    """Process entry point (``python -m adaptigraph_tpu`` / console script):
    the only path allowed to use the axon hard-exit teardown workaround."""
    global _ALLOW_HARD_EXIT
    _ALLOW_HARD_EXIT = True
    main(argv)


if __name__ == "__main__":
    console_main()
