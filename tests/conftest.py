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
# the stream tests are compile-dominated (8-device shard_map graphs with
# unrolled samplers); a persistent cache makes re-runs minutes, not an hour
jax.config.update("jax_compilation_cache_dir", "/tmp/ddsp_svc_tpu_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (large streaming configs, multi-process)",
    )


def pytest_collection_modifyitems(config, items):
    """Default runs skip @pytest.mark.slow (VERDICT r1 #8: keep the default
    suite <=15 min); `pytest --runslow` runs everything."""
    if config.getoption("--runslow"):
        return
    import pytest

    skip = pytest.mark.skip(reason="slow: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
