"""Test config: force JAX onto a virtual 8-device CPU mesh.

This is the standard way to test pjit/ppermute sharding logic without a TPU
pod (SURVEY.md §4d). The container's sitecustomize imports jax at interpreter
start (registering the TPU plugin), so we steer the platform via
jax.config.update — backend selection is lazy, and XLA_FLAGS is read at first
backend initialization, both of which happen after this conftest runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
