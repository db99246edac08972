"""Online physics-parameter estimation: optimizer unit tests + an
end-to-end recovery test mirroring the reference's recorded-fixture demo
(reference: src/planning/demo/demo_granular_1.py — known-parameter
interactions -> optimizer recovers the parameter)."""

import numpy as np
import pytest

import jax

from adaptigraph_tpu.models.gnn import GNNConfig, init_params
from adaptigraph_tpu.ops.graph import EdgeConfig
from adaptigraph_tpu.planning.forward import DynamicsConfig, dynamics_masked
from adaptigraph_tpu.planning.physics_optimizer import (
    CMAES,
    GPOptimizer1D,
    PhysicsParamOnlineOptimizer,
    dynamics_error_population,
)

GNN = GNNConfig(n_his=2, max_nobj=20, max_neef=1, nf_particle=32,
                nf_relation=32, nf_effect=32, pstep=2)
DCFG = DynamicsConfig(gnn=GNN, edge=EdgeConfig(max_nobj=20, max_neef=1, topk=5),
                      n_his=2, push_length=0.1, max_repeat=3, adj_thresh=0.8)


def test_cmaes_quadratic():
    target = np.array([0.3, 0.9])
    es = CMAES(np.array([0.5, 0.5]), sigma0=0.2, seed=1)
    for _ in range(40):
        xs = es.ask()
        es.tell(xs, ((xs - target) ** 2).sum(axis=1))
    assert np.allclose(es.best_x, target, atol=0.02)


def test_cmaes_respects_bounds():
    es = CMAES(np.array([0.0]), sigma0=0.5, seed=0)
    for _ in range(10):
        xs = es.ask()
        assert xs.min() >= -0.2 and xs.max() <= 1.2
        es.tell(xs, (xs[:, 0] + 10) ** 2)  # pulls toward the lower bound
    assert -0.2 <= es.best_x[0] <= 1.2


def test_gp1d_finds_minimum():
    f = lambda x: (x - 0.42) ** 2 + 0.002 * np.sin(20 * x)
    gp = GPOptimizer1D(seed=0)
    x0 = np.linspace(-0.2, 1.2, 8)
    gp.add(x0, f(x0))
    for _ in range(4):
        xs = gp.propose(4)
        gp.add(xs, f(xs))
    x, _ = gp.posterior_min()
    assert abs(x - 0.42) < 0.06


def _make_interactions(params, p_true, n_inter=4, seed=0):
    """Generate 'real' observations with the model itself at p_true."""
    rng = np.random.RandomState(seed)
    inter = []
    for i in range(n_inter):
        n = rng.randint(12, 20)
        t = np.linspace(0, 1.5, n)
        pts = np.stack([t - 1.0, 0.05 * np.ones(n), 0.2 * np.sin(3 * t + i)], 1)
        state = (pts + rng.randn(n, 3) * 0.01).astype(np.float32)
        act = np.array([state[0, 0] - 0.3, state[0, 2], 0.0, 2.0], np.float32)
        s_pad = np.zeros((GNN.max_nobj, 3), np.float32)
        s_pad[:n] = state
        m = np.zeros(GNN.max_nobj, bool)
        m[:n] = True
        real = dynamics_masked(params, s_pad[None], m[None], act[None],
                               np.asarray([[p_true]], np.float32), DCFG)[0]
        inter.append((act, state, np.asarray(real)[:n], np.asarray(real)[:n]))
    return inter


@pytest.fixture(scope="module")
def model_params():
    return init_params(jax.random.PRNGKey(3), GNN)


def test_population_error_orders_candidates(model_params):
    """Error at the true parameter must be (near) zero and the population
    call must match per-candidate calls."""
    p_true = 0.3
    opt = PhysicsParamOnlineOptimizer(DCFG, model_params, phys_dim=1)
    for act, si, sp, sr in _make_interactions(model_params, p_true):
        opt.add_interaction(act, si, sp, sr)
    cand = np.asarray([[0.3], [0.5], [0.9]], np.float32)
    errs = opt.evaluate(cand)
    assert errs[0] < 1e-4  # exact model, exact param -> ~0 chamfer
    assert errs[0] <= errs[1] <= errs[2] or errs[0] < min(errs[1], errs[2])
    # population call == singleton calls
    for j in range(3):
        single = opt.evaluate(cand[j : j + 1])
        np.testing.assert_allclose(errs[j], single[0], rtol=1e-4, atol=1e-6)


def test_online_recovery_1d(model_params):
    """End-to-end: recorded interactions generated at p_true, estimate starts
    at 0.5 and recovers p_true (the demo_granular_1 contract)."""
    p_true = 0.25
    opt = PhysicsParamOnlineOptimizer(DCFG, model_params, phys_dim=1)
    for act, si, sp, sr in _make_interactions(model_params, p_true, seed=1):
        opt.add_interaction(act, si, sp, sr)
    est, err, err_init = opt.optimize(iterations=24)
    assert err <= err_init
    assert abs(est[0] - p_true) < 0.1


def test_interaction_roundtrip(tmp_path, model_params):
    opt = PhysicsParamOnlineOptimizer(DCFG, model_params, phys_dim=1,
                                      save_dir=str(tmp_path))
    for act, si, sp, sr in _make_interactions(model_params, 0.4, n_inter=2):
        opt.add_interaction(act, si, sp, sr)
    opt2 = PhysicsParamOnlineOptimizer(DCFG, model_params, phys_dim=1)
    opt2.load_interactions(str(tmp_path))
    assert len(opt2._interactions) == 2
    np.testing.assert_allclose(opt.evaluate([[0.7]]), opt2.evaluate([[0.7]]),
                               rtol=1e-5)


def test_online_recovery_multid_cma():
    """Multi-dimensional physics params route through CMA-ES
    (reference: physics_param_optimizer.py:150-154 uses CMA for phys_dim>1;
    BASELINE.md eval #4 'CMA-ES adaptation'): recorded interactions at a
    2-D true parameter, estimate starts at (0.5, 0.5) and improves toward it."""
    gnn2 = GNNConfig(n_his=2, max_nobj=20, max_neef=1, nf_particle=32,
                     nf_relation=32, nf_effect=32, pstep=2, phys_dim=2)
    dcfg2 = DynamicsConfig(gnn=gnn2, edge=EdgeConfig(max_nobj=20, max_neef=1, topk=5),
                           n_his=2, push_length=0.1, max_repeat=3, adj_thresh=0.8)
    params = init_params(jax.random.PRNGKey(5), gnn2)
    p_true = np.array([0.3, 0.7], np.float32)

    rng = np.random.RandomState(2)
    opt = PhysicsParamOnlineOptimizer(dcfg2, params, phys_dim=2)
    for i in range(4):
        n = rng.randint(12, 20)
        t = np.linspace(0, 1.5, n)
        pts = np.stack([t - 1.0, 0.05 * np.ones(n), 0.2 * np.sin(3 * t + i)], 1)
        state = (pts + rng.randn(n, 3) * 0.01).astype(np.float32)
        act = np.array([state[0, 0] - 0.3, state[0, 2], 0.0, 2.0], np.float32)
        s_pad = np.zeros((gnn2.max_nobj, 3), np.float32)
        s_pad[:n] = state
        m = np.zeros(gnn2.max_nobj, bool)
        m[:n] = True
        real = dynamics_masked(params, s_pad[None], m[None], act[None],
                               p_true[None], dcfg2)[0]
        opt.add_interaction(act, state, np.asarray(real)[:n], np.asarray(real)[:n])

    est, err, err_init = opt.optimize(iterations=60)
    assert est.shape == (2,)
    assert err <= err_init
    # exact model at p_true -> error there is ~0; CMA must land close
    err_true = float(opt.evaluate(p_true[None])[0])
    assert err <= err_true + 2e-3


def test_evaluate_static_padding_invariant(model_params):
    """The static-shape padded evaluate (interaction axis -> pad_i, population
    axis -> pad_p; one compiled program for the whole online loop) must return
    exactly the same errors as the unpadded evaluation."""
    opt_pad = PhysicsParamOnlineOptimizer(DCFG, model_params, phys_dim=1)
    opt_raw = PhysicsParamOnlineOptimizer(DCFG, model_params, phys_dim=1,
                                          pad_i=1, pad_p=1)
    for act, si, sp, sr in _make_interactions(model_params, 0.35, n_inter=3):
        opt_pad.add_interaction(act, si, sp, sr)
        opt_raw.add_interaction(act, si, sp, sr)
    cand = np.asarray([[0.2], [0.35], [0.8]], np.float32)
    np.testing.assert_allclose(opt_pad.evaluate(cand), opt_raw.evaluate(cand),
                               rtol=1e-5, atol=1e-6)
    # growing I (3 -> 4) and odd P (1) keep the same padded program shapes
    a, si, sp, sr = _make_interactions(model_params, 0.35, n_inter=1, seed=9)[0]
    opt_pad.add_interaction(a, si, sp, sr)
    assert np.isfinite(opt_pad.evaluate(cand[:1])[0])
