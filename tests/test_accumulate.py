"""Timestamp accumulators vs a direct loop oracle of the reference semantics
(reference: src/planning/real_world/common/timestamp_accumulator.py), plus
nested-dict utils."""

import math

import numpy as np

from adaptigraph_tpu.realworld.accumulate import (
    TimestampActionAccumulator,
    TimestampObsAccumulator,
    accumulate_timestamp_idxs,
    align_to_global_idxs,
)
from adaptigraph_tpu.utils.nested import (
    nested_dict_check,
    nested_dict_map,
    nested_dict_reduce,
)


def _oracle_accumulate(timestamps, start_time, dt, eps=1e-5,
                       next_global_idx=0, allow_negative=False):
    """Loop transcription of the reference algorithm (timestamp_accumulator.py:6-41)."""
    local_idxs, global_idxs = [], []
    for local_idx, ts in enumerate(timestamps):
        global_idx = math.floor((ts - start_time) / dt + eps)
        if (not allow_negative) and global_idx < 0:
            continue
        if next_global_idx is None:
            next_global_idx = global_idx
        n_repeats = max(0, global_idx - next_global_idx + 1)
        for i in range(n_repeats):
            local_idxs.append(local_idx)
            global_idxs.append(next_global_idx + i)
        next_global_idx += n_repeats
    return local_idxs, global_idxs, (0 if next_global_idx is None
                                     else next_global_idx)


def test_accumulate_idxs_matches_oracle():
    rng = np.random.RandomState(0)
    for trial in range(30):
        dt = rng.uniform(0.02, 0.2)
        start = rng.uniform(-1, 1)
        n = rng.randint(0, 40)
        # sorted timestamps with drops (gaps) and bursts (duplicates in a slot)
        ts = np.sort(start + rng.uniform(-0.3, 3.0, n))
        for next_idx in [0, 3, None]:
            for allow_neg in [False, True]:
                got = accumulate_timestamp_idxs(
                    ts, start, dt, next_global_idx=next_idx,
                    allow_negative=allow_neg)
                want = _oracle_accumulate(
                    list(ts), start, dt, next_global_idx=next_idx,
                    allow_negative=allow_neg)
                assert (list(got[0]), list(got[1]), got[2]) == want, (
                    trial, next_idx, allow_neg)


def test_accumulate_boundary_eps():
    # ts exactly on a slot boundary lands in that slot (eps guard)
    local, glob, nxt = accumulate_timestamp_idxs([0.0, 0.1, 0.2], 0.0, 0.1)
    assert glob == [0, 1, 2] and local == [0, 1, 2] and nxt == 3


def test_align_to_global_idxs_repeats_missing():
    # stream ends early -> last sample repeated for remaining targets
    idx = align_to_global_idxs([0.0, 0.1], [0, 1, 2, 3], 0.0, 0.1)
    assert idx == [0, 1, 1, 1]


def test_obs_accumulator_fills_drops():
    acc = TimestampObsAccumulator(start_time=0.0, dt=0.1)
    # frames at slot 0, 1, then a drop, then slot 3
    acc.put({"x": np.array([[0.0], [1.0]])}, np.array([0.0, 0.1]))
    acc.put({"x": np.array([[3.0]])}, np.array([0.3]))
    assert len(acc) == 4
    np.testing.assert_allclose(acc.data["x"][:, 0], [0.0, 1.0, 3.0, 3.0])
    np.testing.assert_allclose(acc.timestamps, [0.0, 0.1, 0.2, 0.3])
    np.testing.assert_allclose(acc.actual_timestamps, [0.0, 0.1, 0.3, 0.3])


def test_action_accumulator_overwrites():
    acc = TimestampActionAccumulator(start_time=0.0, dt=0.1)
    acc.put(np.array([[1.0], [2.0], [3.0]]), np.array([0.0, 0.1, 0.2]))
    # receding-horizon replan: overwrite slots 1..2, extend to 3
    acc.put(np.array([[20.0], [30.0], [40.0]]), np.array([0.1, 0.2, 0.3]))
    assert len(acc) == 4
    np.testing.assert_allclose(acc.actions[:, 0], [1.0, 20.0, 30.0, 40.0])


def test_obs_accumulator_growth_and_multi_key():
    acc = TimestampObsAccumulator(start_time=0.0, dt=0.01)
    rng = np.random.RandomState(1)
    t, total = 0.0, 0
    for _ in range(10):
        n = rng.randint(1, 20)
        ts = t + np.cumsum(rng.uniform(0.005, 0.03, n))
        data = {"a": rng.randn(n, 3).astype(np.float32),
                "b": rng.randn(n).astype(np.float64)}
        acc.put(data, ts)
        t = ts[-1]
        total += n
    assert len(acc) > 0
    assert acc.data["a"].shape == (len(acc), 3)
    assert acc.data["b"].shape == (len(acc),)
    # global clock is exact
    np.testing.assert_allclose(np.diff(acc.timestamps), 0.01)
    # actual timestamps are within one slot of the global clock
    assert np.all(np.abs(acc.actual_timestamps - acc.timestamps) < 0.04)


def test_nested_dict_utils():
    x = {"a": {"b": 1, "c": 2}, "d": 3}
    assert nested_dict_map(lambda v: v * 2, x) == {"a": {"b": 2, "c": 4}, "d": 6}
    assert nested_dict_reduce(lambda p, q: p + q, x) == 6
    assert nested_dict_check(lambda v: v > 0, x)
    assert not nested_dict_check(lambda v: v > 1, x)
