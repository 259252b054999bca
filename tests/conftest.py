"""Test env defaults: 8-device virtual CPU mesh (SURVEY.md §4 implication c).

The axon-detach re-exec lives in ``transcar_tpu/_pytest_cpu.py`` (loaded
early via pytest.ini addopts, before pytest starts output capture).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
