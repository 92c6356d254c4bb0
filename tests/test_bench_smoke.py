"""The TPU bench harnesses execute end-to-end on CPU smoke shapes.

bench.py guards training, scripts/bench_rollout.py validation, and
scripts/bench_serving.py the exported-artifact serving path; their
floors only protect the project if the scripts themselves keep running.
BR_SMOKE=1 shrinks meshes/windows so the FULL measured path (dataset ->
model -> dispatch loop -> JSON line) executes in CI.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", BR_SMOKE="1",
               JAX_COMPILATION_CACHE_DIR="")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()
             if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    for rec in lines:
        assert rec["value"] > 0
    return {rec["metric"]: rec for rec in lines}

def test_bench_serving_smoke():
    recs = _run("bench_serving.py")
    assert set(recs) == {"serving_eval", "serving_eval_batched",
                        "serving_rollout"}


def test_bench_rollout_smoke():
    recs = _run("bench_rollout.py", "cylinder")
    assert "rollout_cylinder_steps_per_sec" in recs
