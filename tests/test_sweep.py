"""Sweep driver unit tests (reference gen_config.py + experiment.sh flow)."""

import json
import os
import subprocess
import sys

from mppi_tf_tpu.sweep import _split_values, expand_grid


def test_split_values_depth_aware():
    assert _split_values("0.5,1.0") == ["0.5", "1.0"]
    assert _split_values("[1,2],[3,4]") == ["[1,2]", "[3,4]"]
    assert _split_values('{"a":1},2') == ['{"a":1}', "2"]


def test_expand_grid_cross_product_and_targets():
    combos = list(expand_grid(["lambda=0.5,1.0", "task.Q=[1,2]",
                               "model.mass=2.0"]))
    assert len(combos) == 2  # 2 x 1 x 1
    targets = {t for combo in combos for (t, _, _) in combo}
    assert targets == {"env", "task", "model"}
    env_vals = sorted(v for combo in combos for (t, k, v) in combo
                      if t == "env")
    assert env_vals == [0.5, 1.0]
    (t, k, v) = [x for x in combos[0] if x[0] == "task"][0]
    assert k == "Q" and v == [1, 2]


def test_dump_dir_mode(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "mppi_tf_tpu.sweep",
         "--config", "envs/point_mass", "--task", "tasks/static_cost",
         "--model", "models/point_mass_model",
         "--set", "lambda=0.7", "--dump-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr
    d = tmp_path / "combo_0000"
    assert (d / "env.yaml").exists() and (d / "task.yaml").exists()
    assert (d / "model.yaml").exists()
    ov = json.loads((d / "overrides.json").read_text())
    assert ov == {"env.lambda": 0.7}
