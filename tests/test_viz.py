"""Visualization utilities: projection math, frame rendering, video/plot
artifact writing."""

import os

import numpy as np

from adaptigraph_tpu.utils.viz import (
    draw_graph,
    plot_error_curves,
    plot_planning_progress,
    project_points,
    render_rollout_frames,
    save_video,
    topdown_camera,
)


def test_project_topdown_centered():
    intr, extr = topdown_camera(scale=60.0, img_size=(360, 360), height=12.0)
    uv, z = project_points(np.array([[0.0, 0.0, 0.0]]), intr, extr)
    np.testing.assert_allclose(uv[0], [180.0, 180.0], atol=1e-6)
    np.testing.assert_allclose(z[0], 12.0)
    # +x in world moves right in image
    uv2, _ = project_points(np.array([[1.0, 0.0, 0.0]]), intr, extr)
    assert uv2[0, 0] > 180.0


def test_draw_graph_marks_pixels():
    intr, extr = topdown_camera()
    img = np.zeros((360, 360, 3), np.uint8)
    pts = np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.5]])
    nbrs = np.array([[1], [0]])
    out = draw_graph(img, pts, intr, extr, neighbors=nbrs)
    assert out.sum() > 0


def test_rollout_video_and_plots(tmp_path):
    rng = np.random.RandomState(0)
    T, N = 5, 30
    pred = rng.randn(T, N, 3) * 0.5
    gt = pred + rng.randn(T, N, 3) * 0.05
    intr, extr = topdown_camera()
    frames = render_rollout_frames(pred, gt, intr, extr, img_size=(180, 180))
    assert len(frames) == T and frames[0].shape == (180, 540, 3)
    vp = save_video(frames, str(tmp_path / "roll.mp4"), fps=5)  # may fall back to gif
    assert os.path.getsize(vp) > 0

    stats = {"median": np.linspace(0, 0.1, 20),
             "q25": np.linspace(0, 0.08, 20),
             "q75": np.linspace(0, 0.12, 20)}
    pp = plot_error_curves(stats, str(tmp_path / "err.png"))
    assert os.path.getsize(pp) > 0
    p2 = plot_planning_progress([0.5, 0.4, 0.2], str(tmp_path / "plan.png"))
    assert os.path.getsize(p2) > 0


def test_stage_timer():
    import time as _t

    from adaptigraph_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    with timer("outer"):
        with timer("inner"):
            _t.sleep(0.01)
    s = timer.stats()
    assert "outer" in s and "outer/inner" in s
    assert s["outer/inner"]["total_s"] >= 0.01
    assert s["outer"]["total_s"] >= s["outer/inner"]["total_s"]


def test_time_jitted():
    import jax.numpy as jnp
    import jax

    from adaptigraph_tpu.utils.profiling import time_jitted

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    mean, std = time_jitted(f, x, iters=3)
    assert mean > 0


def test_quaternion_library():
    from adaptigraph_tpu.utils.transforms import (
        euler_to_quat,
        quat_conjugate,
        quat_from_axis_angle,
        quat_from_rotmat,
        quat_mul,
        quat_to_rotmat,
        rotate_vec,
    )

    rng = np.random.RandomState(0)
    for _ in range(20):
        axis = rng.randn(3)
        ang = rng.uniform(-np.pi, np.pi)
        q = quat_from_axis_angle(axis, ang)
        R = quat_to_rotmat(q)
        # roundtrip matrix <-> quaternion (up to sign)
        q2 = quat_from_rotmat(R)
        assert min(np.abs(q2 - q).max(), np.abs(q2 + q).max()) < 1e-9
        # composition consistency
        q_b = quat_from_axis_angle(rng.randn(3), rng.uniform(-np.pi, np.pi))
        np.testing.assert_allclose(quat_to_rotmat(quat_mul(q, q_b)),
                                   R @ quat_to_rotmat(q_b), atol=1e-9)
        # conjugate inverts
        v = rng.randn(3)
        np.testing.assert_allclose(rotate_vec(quat_conjugate(q), rotate_vec(q, v)),
                                   v, atol=1e-9)
    # euler: yaw-only matches quat_from_yaw
    from adaptigraph_tpu.utils.transforms import quat_from_yaw

    np.testing.assert_allclose(euler_to_quat(0.0, 0.7, 0.0),
                               quat_from_yaw(0.7), atol=1e-12)
