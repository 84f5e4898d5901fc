"""Config system + observer tests: YAML families, replay round trip,
sweep patching, metric writing, config snapshotting."""

import json
import os

import numpy as np
import pytest

from mppi_tf_tpu.cfg import default_config, parse_config, parse_dir, patch_config
from mppi_tf_tpu.cfg.config import write_config
from mppi_tf_tpu.observer import Observer


class TestConfig:
    def test_bundled_defaults_load(self):
        env = default_config("envs/point_mass")
        assert env["samples"] == 3000
        assert env["horizon"] == 50
        task = default_config("tasks/static_cost")
        assert task["type"] == "static"
        model = default_config("models/rexrov2")
        assert model["type"] == "auv"
        assert np.asarray(model["Ma"]).shape == (6, 6)

    def test_every_bundled_default_builds(self):
        """Every bundled YAML loads and constructs through its factory.

        Mirrors the reference config inventory: envs/{point_mass, bluerov,
        uuv_sim, falcon_vaarst}, models/{point_mass_model, rexrov2, bluerov,
        falcon_vaarst, nn_model, auv_nn_model_quat, auv_nn_model_euler},
        tasks/{static_cost, static_cost_auv, elipse_task, elipse3d_task,
        vaarst_trials/static_task1}.
        """
        from mppi_tf_tpu.cfg.config import _DEFAULTS_DIR
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.models import get_model

        names = []
        for root, _dirs, files in os.walk(_DEFAULTS_DIR):
            for f in sorted(files):
                if f.endswith(".yaml"):
                    names.append(os.path.relpath(
                        os.path.join(root, f[:-5]), _DEFAULTS_DIR))
        envs = [n for n in names if n.startswith("envs/")]
        models = [n for n in names if n.startswith("models/")]
        tasks = [n for n in names if n.startswith("tasks/")]
        assert len(envs) >= 4 and len(models) >= 7 and len(tasks) >= 5

        for n in envs:
            cfg = default_config(n)
            noise = np.asarray(cfg["noise"])
            assert noise.shape == (cfg["action-dim"], cfg["action-dim"])
            assert cfg["dt"] > 0
        for n in models:
            cfg = default_config(n)
            s_dim, a_dim = (6, 3) if cfg["type"] in ("point_mass",
                                                     "neural_net",
                                                     "dmd") else (13, 6)
            model = get_model(cfg, dt=0.1, state_dim=s_dim, action_dim=a_dim)
            assert model is not None
            if cfg["type"] == "auv":
                # neutral-ish buoyancy sanity: mass within 2x of displaced
                # water mass
                assert 0.5 < cfg["mass"] / (cfg["volume"] * cfg["density"]) < 2.0
        for n in tasks:
            cfg = default_config(n)
            a_dim = 6 if "auv" in n or "elipse3d" in n or "vaarst" in n else 3
            if cfg["type"] in ("elipse",):
                a_dim = 2
            sigma = np.eye(a_dim)
            cost = get_cost(cfg, lam=1.0, gamma=1.0, upsilon=1.0, sigma=sigma)
            assert cost is not None

    def test_unknown_default_lists_available(self):
        with pytest.raises(FileNotFoundError) as e:
            default_config("envs/nonexistent")
        assert "point_mass" in str(e.value)

    def test_patch_config_sweep(self):
        env = default_config("envs/point_mass")
        patched = patch_config(env, **{"lambda": 0.25}, upsilon=2.0,
                               samples=512)
        assert patched["lambda"] == 0.25
        assert patched["upsilon"] == 2.0
        assert patched["samples"] == 512
        assert env["lambda"] == 1.0  # original untouched

    def test_patch_noise_scalar_scales_matrix(self):
        env = default_config("envs/point_mass")
        patched = patch_config(env, noise=2.0)
        np.testing.assert_allclose(np.asarray(patched["noise"]),
                                   2.0 * np.asarray(env["noise"]))

    def test_write_and_parse_round_trip(self, tmp_path):
        env = default_config("envs/point_mass")
        path = write_config(env, str(tmp_path / "cfg.yaml"))
        again = parse_config(path)
        assert again == env


class TestObserver:
    def test_snapshot_and_replay_round_trip(self, tmp_path):
        env = default_config("envs/point_mass")
        task = default_config("tasks/static_cost")
        model = default_config("models/point_mass_model")
        obs = Observer(log_path=str(tmp_path), env_cfg=env, task_cfg=task,
                       model_cfg=model, use_tensorboard=False)
        logdir = obs.get_logdir()
        obs.close()
        env2, task2, model2 = parse_dir(logdir)
        assert env2 == env
        assert task2 == task
        assert model2 == model

    def test_scalar_and_histogram_jsonl(self, tmp_path):
        obs = Observer(log_path=str(tmp_path), use_tensorboard=False)
        obs.scalar("Cost/cost_min", 1.5)
        obs.advance()
        obs.scalar("Cost/cost_min", 1.2)
        obs.histogram("Controller/weights", np.ones(10))
        obs.close()
        lines = [json.loads(l) for l in
                 open(os.path.join(obs.get_logdir(), "metrics.jsonl"))]
        assert lines[0] == {"step": 0, "Cost/cost_min": 1.5}
        assert lines[1]["step"] == 1

    def test_write_control_catalogue(self, tmp_path):
        obs = Observer(log_path=str(tmp_path), use_tensorboard=False)
        info = {
            "cost_min": 1.0, "cost_mean": 2.0, "cost_max": 3.0,
            "nabla": 5.0, "sample_costs": np.ones(10),
            "weights": np.full(10, 0.1), "arg": np.zeros(10),
            "weighted_noise": np.zeros((4, 2)),
            "noise": np.zeros((10, 4, 2)),
        }
        obs.write_control(state=np.zeros(6), action=np.ones(3), info=info)
        obs.close()
        text = open(os.path.join(obs.get_logdir(), "metrics.jsonl")).read()
        assert "Cost/cost_min" in text
        assert "Controller/nabla_percent" in text
        assert "Controller/noise" in text
        assert "Input/axis_2" in text

    def test_write_predict_quaternion_decomposition(self, tmp_path):
        obs = Observer(log_path=str(tmp_path), use_tensorboard=False)
        gt = np.zeros(13)
        gt[6] = 1.0
        pred = gt.copy()
        pred[0] = 0.1  # position error only
        obs.write_predict(x=gt, u=np.zeros(6), x_next=gt, pred=pred)
        obs.close()
        lines = [json.loads(l) for l in
                 open(os.path.join(obs.get_logdir(), "metrics.jsonl"))]
        by_tag = {k: v for l in lines for k, v in l.items() if k != "step"}
        np.testing.assert_allclose(by_tag["Predict/error_position"], 0.1,
                                   rtol=1e-6)
        np.testing.assert_allclose(by_tag["Predict/error_rotation"], 0.0,
                                   atol=1e-9)


class TestCLI:
    def test_cli_end_to_end(self, tmp_path):
        """The main experiment runner works from bundled configs."""
        from mppi_tf_tpu import cli

        rc = cli.main([
            "--config", "envs/point_mass", "--task", "tasks/static_cost",
            "--model", "models/point_mass_model", "-s", "5",
            "--log-dir", str(tmp_path), "--cpu",
        ])
        assert rc == 0

    def test_cli_replay(self, tmp_path, capsys):
        from mppi_tf_tpu import cli

        rc = cli.main([
            "--config", "envs/point_mass", "--task", "tasks/static_cost",
            "--model", "models/point_mass_model", "-s", "3", "-l",
            "--log-dir", str(tmp_path), "--cpu",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        logdir = out["logdir"]
        assert logdir is not None
        rc = cli.main(["--replay", "--log-dir", logdir, "-s", "2", "--cpu"])
        assert rc == 0

    def test_cli_filter_flag(self, tmp_path, monkeypatch):
        """-f/--filter (reference main.py:44-48) forces Savitzky-Golay
        smoothing: the built controller must carry the filter operator."""
        from mppi_tf_tpu import cli
        from mppi_tf_tpu.controller import mppi as mppi_mod

        built = []
        orig = mppi_mod.MPPI.__init__

        def spy(self, *a, **kw):
            orig(self, *a, **kw)
            built.append(self)

        monkeypatch.setattr(mppi_mod.MPPI, "__init__", spy)
        rc = cli.main([
            "--config", "envs/point_mass", "--task", "tasks/static_cost",
            "--model", "models/point_mass_model", "-s", "2", "-f",
            "--log-dir", str(tmp_path), "--cpu",
        ])
        assert rc == 0
        assert built and built[-1]._S is not None  # savgol matrix installed


class TestPatchConfigEdgeCases:
    def test_scalar_noise_without_base_fails_loudly(self):
        from mppi_tf_tpu.cfg.config import patch_config

        with pytest.raises(ValueError, match="noise"):
            patch_config({"samples": 10}, noise=0.5)
        with pytest.raises(ValueError, match="noise"):
            patch_config({"noise": 0.25}, noise=0.5)  # scalar base

    def test_scalar_noise_scales_1d_diagonal(self):
        from mppi_tf_tpu.cfg.config import patch_config

        out = patch_config({"noise": [0.2, 0.4]}, noise=2.0)
        np.testing.assert_allclose(np.asarray(out["noise"]),
                                   np.diag([0.4, 0.8]))
