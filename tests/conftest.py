"""Test configuration: force a virtual 8-device CPU mesh so every test —
including sharding tests — runs without TPU hardware.

NOTE: the environment may preset JAX_PLATFORMS (e.g. to a TPU tunnel), so we
must override, not setdefault — tests are CPU-only by design.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
