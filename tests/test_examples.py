"""The examples/ directory stays runnable: each script is a user-facing
contract (reference ships ~28 runnable examples; ours run offline with
the mock client). A representative subset runs as subprocesses; the rest
are at least compiled."""

from __future__ import annotations

import os
import py_compile
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
ALL = sorted(
    f for f in os.listdir(EXAMPLES_DIR)
    if f.endswith(".py") and f[0].isdigit()
)


def test_all_examples_compile():
    assert len(ALL) >= 15
    for f in ALL:
        py_compile.compile(os.path.join(EXAMPLES_DIR, f), doraise=True)


@pytest.mark.parametrize("script", [
    "01_quickstart.py",        # quick API + builder
    "11_multi_row_batching.py",  # the headline batching invariant
    "12_response_cache.py",    # cross-run memoization
])
def test_example_runs(script, tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(EXAMPLES_DIR)
    # isolate the memo-cache example's state per test run
    env["TMPDIR"] = str(tmp_path)
    proc = subprocess.run(
        [sys.executable, script], cwd=EXAMPLES_DIR, env=env,
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
