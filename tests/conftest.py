"""Test configuration: run everything on a virtual 8-device CPU mesh.

This image ships an axon TPU PJRT shim on PYTHONPATH (sitecustomize) that
(a) ignores ``--xla_force_host_platform_device_count`` and (b) deadlocks any
jit consuming a NamedSharding-placed array on CPU. Tests need a clean CPU
JAX, so on first entry we re-exec pytest with the shim stripped and the
8-device CPU flags set (SURVEY.md §4: multi-device tests via CPU
device-count spoofing so mesh/pjit paths run in CI without TPUs).
"""

import os
import sys

if os.environ.get("MINTIME_TEST_REEXEC") != "1":
    # pytest has already fd-redirected stdout/stderr for capture; restore the
    # real ones so the re-exec'd pytest's output reaches the terminal.
    try:
        import gc

        from _pytest.capture import CaptureManager

        for obj in gc.get_objects():
            if isinstance(obj, CaptureManager):
                obj.stop_global_capturing()
    except Exception:
        pass
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # drop the axon sitecustomize shim
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["MINTIME_TEST_REEXEC"] = "1"
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
