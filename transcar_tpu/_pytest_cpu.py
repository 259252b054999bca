"""Early pytest plugin: re-exec the test run on a clean-CPU JAX env.

The container's sitecustomize (PYTHONPATH=/root/.axon_site) registers the
axon TPU backend at interpreter start; a later ``JAX_PLATFORMS=cpu`` is
ignored because jax's config was already loaded.  Tests want an 8-device
virtual CPU mesh (SURVEY.md §4c), so when we detect the hook we re-exec
pytest once with a cleaned environment.

Loaded via ``addopts = -p transcar_tpu._pytest_cpu`` in pytest.ini — early
plugins import *before* pytest starts global capture, so the re-exec'd
child owns the real stdout.
"""
import os
import sys

_SENTINEL = "TRANSCAR_TPU_TEST_REEXEC"

if (_SENTINEL not in os.environ
        and "axon" in os.environ.get("PYTHONPATH", "")):
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    os.execvpe(sys.executable,
               [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
