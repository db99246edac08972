import numpy as np

import jax.numpy as jnp

from adaptigraph_tpu.ops.costs import (
    chamfer,
    masked_chamfer,
    box_loss,
    rope_penalty,
    granular_penalty,
    cloth_penalty,
    bbox_penalty,
)


def chamfer_oracle(x, y):
    d = np.linalg.norm(x[:, None] - y[None], axis=-1)
    return d.min(axis=1).mean() + d.min(axis=0).mean()


def test_chamfer_matches_oracle(rng):
    x = rng.randn(1, 20, 3).astype(np.float32)
    y = rng.randn(1, 15, 3).astype(np.float32)
    got = float(chamfer(jnp.asarray(x), jnp.asarray(y))[0])
    want = chamfer_oracle(x[0], y[0])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_masked_chamfer_equals_cropped(rng):
    B, N = 3, 20
    x = rng.randn(B, N, 3).astype(np.float32)
    y = rng.randn(B, N, 3).astype(np.float32)
    xm = np.zeros((B, N), dtype=bool)
    ym = np.zeros((B, N), dtype=bool)
    ns = [5, 12, 20]
    ms = [20, 7, 3]
    for b in range(B):
        xm[b, : ns[b]] = True
        ym[b, : ms[b]] = True
    got = np.asarray(masked_chamfer(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xm), jnp.asarray(ym)))
    for b in range(B):
        want = chamfer_oracle(x[b, : ns[b]], y[b, : ms[b]])
        np.testing.assert_allclose(got[b], want, rtol=1e-4)


def test_box_loss_zero_inside(rng):
    target = jnp.asarray([[-1.0, 1.0], [-1.0, 1.0]])
    inside = jnp.zeros((2, 5, 3))
    np.testing.assert_allclose(np.asarray(box_loss(inside, target)), 0.0)
    outside = jnp.ones((1, 4, 3)) * 3.0
    # each point: x over by 2, z over by 2 -> r = sqrt(8)
    np.testing.assert_allclose(np.asarray(box_loss(outside, target)), np.sqrt(8.0), rtol=1e-5)


def test_penalties_shapes(rng):
    B, L, N = 4, 2, 10
    state_pred = jnp.asarray(rng.randn(B, L, N, 3).astype(np.float32))
    action = jnp.asarray(rng.randn(B, L, 4).astype(np.float32))
    state_init = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    for fn in (rope_penalty, granular_penalty):
        out = fn(state_pred, action, state_init)
        assert out.shape == (B, L)
        assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)
    out = cloth_penalty(state_pred, action, state_init)
    assert out.shape == (B, L)
    bbox = jnp.asarray([[-5.0, 5.0], [-5.0, 5.0]])
    out = bbox_penalty(state_pred, bbox)
    assert out.shape == (B, L)


def test_rope_penalty_near_vs_far():
    state_init = jnp.zeros((5, 3))
    state_pred = jnp.zeros((2, 1, 5, 3))
    action_near = jnp.asarray([[[0.0, 0.0, 0.0, 1.0]]])
    action_far = jnp.asarray([[[50.0, 50.0, 0.0, 1.0]]])
    near = float(rope_penalty(state_pred[:1], action_near, state_init)[0, 0])
    far = float(rope_penalty(state_pred[:1], action_far, state_init)[0, 0])
    assert near > 0.9 and far < 1e-3


def test_hausdorff_known_value():
    from adaptigraph_tpu.ops.costs import hausdorff

    x = jnp.asarray([[[0.0, 0, 0], [1, 0, 0]]])
    y = jnp.asarray([[[0.0, 0, 0], [3, 0, 0]]])
    # d_xy: max(min-dists x->y) = max(0, 1) = 1; d_yx: max(0, 2) = 2
    np.testing.assert_allclose(float(hausdorff(x, y)[0]), 3.0, atol=1e-4)


def test_emd_hungarian_permutation_invariant():
    from adaptigraph_tpu.ops.costs import emd_hungarian

    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 3).astype(np.float32)
    perm = rng.permutation(12)
    d = emd_hungarian(x, x[:, perm])
    np.testing.assert_allclose(d, 0.0, atol=1e-6)
    y = x + 0.5
    np.testing.assert_allclose(emd_hungarian(x, y), 0.5 * np.sqrt(3), atol=1e-5)


def test_emd_sinkhorn_close_to_hungarian():
    import jax
    from adaptigraph_tpu.ops.costs import emd_hungarian, emd_sinkhorn

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 16, 3).astype(np.float32) * 0.3)
    y = jnp.asarray(rng.randn(3, 16, 3).astype(np.float32) * 0.3)
    exact = emd_hungarian(x, y)
    approx = np.asarray(emd_sinkhorn(x, y, epsilon=0.01, n_iters=200))
    np.testing.assert_allclose(approx, exact, rtol=0.08)
    # differentiable
    g = jax.grad(lambda a: emd_sinkhorn(a, y).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
