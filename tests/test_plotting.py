"""Plot/GIF artifact utilities (reference utile.py:62-133 equivalents)."""

import os

import numpy as np

from mppi_tf_tpu.utils import plotting


def _fake_run(n=6):
    t = np.linspace(0, 1, n)
    states = np.stack([t, np.zeros(n), t ** 2, np.zeros(n),
                       -t, np.zeros(n)], axis=1)
    return states


def test_plot_trajectory(tmp_path):
    p = plotting.plot_trajectory(_fake_run(), goal=[1, 0, 1, 0, -1, 0],
                                 path=str(tmp_path / "traj.png"))
    assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_step_frames_and_gif(tmp_path):
    states = _fake_run()
    w = [np.random.rand(32) for _ in range(len(states) - 1)]
    eps = [np.random.randn(10, 3) for _ in range(len(states) - 1)]
    frames = plotting.save_step_frames(states, str(tmp_path / "frames"),
                                       goal=[1, 0, 1, 0, -1, 0],
                                       weights_per_step=w,
                                       noises_per_step=eps)
    assert len(frames) == len(states) - 1
    gif = plotting.to_gif(frames, str(tmp_path / "run.gif"), fps=5)
    assert gif is not None and os.path.getsize(gif) > 1000


def test_run_to_gif(tmp_path):
    gif = plotting.run_to_gif(_fake_run(), str(tmp_path / "r.gif"),
                              goal=[1, 0, 1, 0, -1, 0])
    assert gif is not None and os.path.exists(gif)


def test_filter_sweep(tmp_path):
    seq = np.cumsum(np.random.randn(30, 2), axis=0)
    p = plotting.plot_filter_sweep(seq, path=str(tmp_path / "sgf.png"))
    assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_plot_trajectory_3d(tmp_path):
    n = 8
    t = np.linspace(0, 1, n)
    states = np.zeros((n, 13))
    states[:, 0] = t
    states[:, 1] = t ** 2
    states[:, 2] = -t
    states[:, 6] = 1.0  # unit quaternion
    p = plotting.plot_trajectory_3d(
        states, goal=[1, 1, -1] + [0] * 10, path=str(tmp_path / "t3.png"),
        heading_quat_dims=(3, 4, 5, 6))
    assert os.path.exists(p) and os.path.getsize(p) > 1000
