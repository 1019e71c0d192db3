"""Multi-process (multi-host rehearsal) instance sharding, gated behind
GSV_SLOW=1 — spawns 2 jax.distributed CPU processes (Gloo collectives) and
asserts sharded garbling + the commitment reduction match the single-process
oracle bit-for-bit.  See examples/multihost_cut_and_choose.py.

Run with: GSV_SLOW=1 python -m pytest tests/test_multihost.py -q
"""

import os
import subprocess
import sys

import pytest

slow = pytest.mark.skipif(
    not os.environ.get("GSV_SLOW"), reason="set GSV_SLOW=1 to run"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@slow
def test_multihost_parity():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers force cpu themselves
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "multihost_cut_and_choose.py")],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST OK (2 processes)" in out.stdout
    assert out.stdout.count("PARITY OK") == 2
