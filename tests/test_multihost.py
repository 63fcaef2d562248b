"""Multi-host (multi-process) mesh dryrun.

Executes the claim in ``parallel/mesh.py``: multi-host pods join via
``jax.distributed.initialize()`` with unchanged model code (replacing the
reference's single-process DataParallel, train.py:294-296). Two separate
OS processes with 4 virtual CPU devices each form one 8-device global mesh
(gloo collectives standing in for DCN) and run a dp=4 × tp=2 train + eval
step; both must agree on the loss.
"""

import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def test_two_process_mesh_train_step():
    # run in a subprocess: jax.distributed must initialize before any other
    # jax use, which pytest's conftest has already done in this process
    code = (
        "from __graft_entry__ import dryrun_multihost; "
        "dryrun_multihost(2, 4); print('MULTIHOST_OK')"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "MULTIHOST_OK" in res.stdout
