"""Run every example script as a subprocess — end-to-end smoke coverage
(the reference's examples-as-tests pattern, SURVEY.md §4)."""

import os
import subprocess
import sys
from glob import glob

import pytest

# heavyweight (subprocess / full-size / torch-golden) — fast tier skips
pytestmark = pytest.mark.slow

EXAMPLES_DIR = os.path.join(
    os.path.dirname(__file__), "..", "examples"
)
SCRIPTS = sorted(glob(os.path.join(EXAMPLES_DIR, "*", "*.py")))
TRAIN_ARGS = {
    "01_train_dynedge.py": ["--max-epochs", "1", "--batch-size", "16"],
    "03_train_deepice.py": ["--max-epochs", "1", "--batch-size", "8"],
    "02_train_tito_direction.py": [
        "--max-epochs",
        "1",
        "--batch-size",
        "16",
    ],
    "04_train_from_config.py": ["--max-epochs", "1", "--batch-size", "16"],
    "05_train_rnn_tito.py": ["--max-epochs", "1", "--batch-size", "8"],
    "06_train_normalizing_flow.py": ["--max-epochs", "1"],
    "07_train_multiclass_from_configs.py": ["--max-epochs", "1"],
    "08_high_throughput_pipeline.py": [
        "--max-epochs",
        "1",
        "--n-events",
        "256",
    ],
    "01_deploy_model.py": ["--max-epochs", "1", "--batch-size", "16"],
}


@pytest.mark.parametrize(
    "script", SCRIPTS, ids=[os.path.basename(s) for s in SCRIPTS]
)
def test_example_runs(script):
    env = dict(os.environ)
    # run examples on CPU: disable the axon TPU plugin registration and
    # let the plain CPU backend load (fast, hermetic)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo_root = os.path.abspath(os.path.dirname(EXAMPLES_DIR))
    env["PYTHONPATH"] = (
        repo_root + os.pathsep + env.get("PYTHONPATH", "")
    )
    args = TRAIN_ARGS.get(os.path.basename(script), [])
    result = subprocess.run(
        [sys.executable, script, *args],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=os.path.dirname(EXAMPLES_DIR),
    )
    assert result.returncode == 0, (
        f"{script} failed:\nSTDOUT:\n{result.stdout[-3000:]}\n"
        f"STDERR:\n{result.stderr[-3000:]}"
    )
