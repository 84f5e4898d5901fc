"""verify_models CLI: open-loop rollout vs ground truth.

Reference: scripts/verify_models.py (+ test_models.py comparison plots):
config-or-logdir model loading with latest ``weights_step*`` discovery,
npz/npy sequence files, per-dimension MSE report, comparison plot.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mppi_tf_tpu.models import get_model
from mppi_tf_tpu.verify_models import main


@pytest.fixture()
def fixtures(tmp_path):
    rng = np.random.default_rng(0)
    seq = rng.normal(size=(10, 3))
    model = get_model({"type": "point_mass", "mass": 5.0}, dt=0.1,
                      state_dim=6, action_dim=3, dtype=jnp.float64)
    p = model.init_params()
    traj = np.asarray(model.run_model(p, jnp.zeros(6), jnp.asarray(seq)))
    seq_npy = str(tmp_path / "seq.npy")
    gt_npz = str(tmp_path / "gt.npz")
    np.save(seq_npy, seq)
    np.savez(gt_npz, traj=traj)
    return seq_npy, gt_npz, tmp_path


def test_npy_seq_npz_gt_and_plot(fixtures, capsys):
    seq_npy, gt_npz, tmp_path = fixtures
    plot = str(tmp_path / "cmp.png")
    # bundled point_mass_model has mass 5 (matches the gt generator)
    rc = main(["--cpu", "--models", "models/point_mass_model",
               "--seq", seq_npy, "--gt", gt_npz, "--plot", plot])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out[0]["mse"] == 0.0  # same model => exact reproduction
    assert os.path.exists(plot)


def test_multi_model_labels(fixtures, capsys):
    seq_npy, gt_npz, _ = fixtures
    rc = main(["--cpu",
               "--models", "models/point_mass_model", "models/nn_model",
               "--labels", "pm", "nn",
               "--seq", seq_npy, "--gt", gt_npz])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert [r["model"] for r in out] == ["pm", "nn"]
    assert out[0]["mse"] <= out[1]["mse"]  # analytic beats untrained NN


def test_logdir_checkpoint_discovery(fixtures, capsys, tmp_path):
    # a learner logdir with weights_step{n} checkpoints: the latest wins
    from mppi_tf_tpu.learning.checkpoint import save_checkpoint

    seq_npy, gt_npz, _ = fixtures
    logdir = tmp_path / "learner_log"
    logdir.mkdir()
    model = get_model({"type": "point_mass", "mass": 5.0}, dt=0.1,
                      state_dim=6, action_dim=3)
    save_checkpoint(str(logdir / "weights_step5"), model.init_params())
    save_checkpoint(str(logdir / "weights_step20"), model.init_params())
    with open(logdir / "model.yaml", "w") as f:
        f.write("type: point_mass\nmass: 5.0\n")
    rc = main(["--cpu", "--models", str(logdir),
               "--seq", seq_npy, "--gt", gt_npz])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out[0]["mse"] < 1e-9


def test_bad_archive_key_fails_loudly(fixtures, tmp_path):
    seq_npy, gt_npz, _ = fixtures
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, foo=np.zeros((3, 3)), bar=np.ones((2,)))
    with pytest.raises(KeyError, match="actions"):
        main(["--cpu", "--models", "models/point_mass_model",
              "--seq", bad, "--gt", gt_npz])
