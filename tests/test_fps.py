import numpy as np

import jax.numpy as jnp

from adaptigraph_tpu.ops.fps import fps_numpy, fps_rad_numpy, fps_downsample, fps_jax


def fps_oracle(pcd, num, start):
    idxs = [start]
    dist = np.linalg.norm(pcd - pcd[start], axis=1)
    while len(idxs) < num:
        nxt = int(dist.argmax())
        idxs.append(nxt)
        dist = np.minimum(dist, np.linalg.norm(pcd - pcd[nxt], axis=1))
    return idxs


def test_fps_numpy_matches_oracle(rng):
    pcd = rng.randn(50, 3)
    got = fps_numpy(pcd, 10, start_idx=3)
    assert got.tolist() == fps_oracle(pcd, 10, 3)


def test_fps_rad_terminates_and_covers(rng):
    pcd = rng.randn(100, 3)
    idx = fps_rad_numpy(pcd, radius=0.5, rng=np.random.RandomState(1))
    sel = pcd[idx]
    # every point within radius of some selected point
    d = np.linalg.norm(pcd[:, None] - sel[None], axis=-1).min(axis=1)
    assert d.max() <= 0.5 + 1e-9


def test_fps_downsample_bounded(rng):
    pcd = rng.randn(200, 3)
    idx = fps_downsample(pcd, 50, 0.4, rng=np.random.RandomState(2))
    assert len(idx) <= 50
    assert len(set(idx.tolist())) == len(idx)


def test_fps_jax_matches_numpy(rng):
    pcd = rng.randn(40, 3).astype(np.float32)
    mask = np.ones(40, dtype=bool)
    idxs, valid = fps_jax(jnp.asarray(pcd), jnp.asarray(mask), 12, start_idx=5)
    assert np.asarray(valid).all()
    assert np.asarray(idxs).tolist() == fps_oracle(pcd, 12, 5)


def test_fps_jax_masked(rng):
    pcd = rng.randn(40, 3).astype(np.float32)
    mask = np.zeros(40, dtype=bool)
    mask[:8] = True
    idxs, valid = fps_jax(jnp.asarray(pcd), jnp.asarray(mask), 12, start_idx=0)
    idxs, valid = np.asarray(idxs), np.asarray(valid)
    assert valid[:8].all() and not valid[8:].any()
    assert (idxs[valid] < 8).all()


def test_downsample_early_stop_matches_two_stage():
    """The fused max_num>=n early-stop path must match the explicit
    two-stage (full FPS then radius dedup) exactly, tie-breaks included."""
    from adaptigraph_tpu.ops.fps import fps_numpy, fps_rad_numpy_from

    rng = np.random.RandomState(11)
    for n in (5, 37, 96):
        for radius in (0.05, 0.2, 0.7):
            pcd = rng.rand(n, 3)
            got = fps_downsample(pcd, 100, radius, start_idx=3)
            idx1 = fps_numpy(pcd, 100, start_idx=3)
            idx2 = fps_rad_numpy_from(pcd[idx1], radius, start=0)
            np.testing.assert_array_equal(got, idx1[idx2])
