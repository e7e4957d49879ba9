"""TRUE multi-process validation (2 OS processes, gloo CPU collectives).

The rest of the suite shards over 8 virtual devices in ONE process; this
spawns `scripts/multihost_validation.py`, which joins two processes through
`parallel.distributed.initialize` and runs a cross-process gradient
all-reduce (DP train step) and a cross-process ring-halo ppermute
(frame-sharded FastDVDnet), each asserted against local single-device
oracles inside the workers.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_validation():
    env = dict(os.environ)
    # the workers set their own XLA_FLAGS / platform; scrub the suite's
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/multihost_validation.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "multihost validation: 2 processes OK" in out.stdout
