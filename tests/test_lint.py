"""The in-repo lint surface stays clean (tools/check_lint.py: the F401/
F811/W29x subset of the CI ruff job, runnable without the ruff binary)."""

import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.driver  # CI-surface check, not inner-loop logic


def test_lint_clean():
    repo = pathlib.Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "check_lint.py")],
        cwd=repo, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout
