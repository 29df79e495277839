"""Test configuration: force CPU with 8 virtual devices (the TPU-equivalent of
a fake multi-chip backend).

Note: this image's sitecustomize imports jax at interpreter startup (axon TPU
plugin), so env vars alone are too late — we must go through jax.config.
XLA_FLAGS is still read lazily when the CPU client is first created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run slow-marked tests (multi-minute reference-torch parity / "
        "multi-process fixtures); also enabled by RECOMBINER_RUN_SLOW=1",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute fixture (reference-torch parity, 2-process "
        "multi-host); skipped by default — opt in with --runslow or "
        "RECOMBINER_RUN_SLOW=1 (the default loop must stay under ~15 min "
        "on this 1-core host)",
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    if config.getoption("--runslow") or os.environ.get("RECOMBINER_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
