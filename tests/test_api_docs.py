"""Generated API reference stays in sync with the package.

Re-runs tools/gen_api_docs.py into a temp dir and diffs against the
committed docs/api/ — fails when a public API changed without
regenerating (the reference keeps its sphinx site fresh the same way,
via CI builds of ``docs/``)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_docs_fresh(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["API_DOCS_OUT"] = str(tmp_path)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_api_docs.py")],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    committed = os.path.join(REPO, "docs", "api")
    fresh_files = sorted(os.listdir(tmp_path))
    assert fresh_files == sorted(os.listdir(committed))
    stale = []
    for name in fresh_files:
        with open(tmp_path / name) as f:
            new = f.read()
        with open(os.path.join(committed, name)) as f:
            old = f.read()
        if new != old:
            stale.append(name)
    assert not stale, (
        f"docs/api/{stale} out of date — rerun "
        "`env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= "
        "python tools/gen_api_docs.py`"
    )
