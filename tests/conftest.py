"""Test harness: CPU backend, f64, 8 virtual devices for sharding tests.

The fake-backend strategy (SURVEY.md §4.4): XLA_FLAGS host-device-count
gives an 8-device CPU mesh so every distributed code path is exercised
without a TPU pod.  Must run before the first jax backend initialization.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

# Tier markers (round-3 verdict item 7): file-level classification so
#   -m fast                 ~10-min gate (units, compat, golden, config, IO)
#   -m pallas               interpret-mode fused-kernel/sharding equality
#   -m physics              long physics integrations (onset brackets etc.)
# Full coverage = no -m flag (all three tiers; ~40-45 min, CLAUDE.md).
_TIER_FILES = {
    "test_pallas_fused": "pallas",
    "test_sharding": "pallas",
    "test_multihost": "pallas",
    "test_electroconvection": "physics",
    "test_rayleigh_benard": "physics",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "fast: quick unit/compat tier (<10 min)")
    config.addinivalue_line(
        "markers", "pallas: interpret-mode Pallas/sharding equality tier")
    config.addinivalue_line(
        "markers", "physics: long physics-integration tier")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.nodeid.split("::")[0].rsplit("/", 1)[-1].removesuffix(".py")
        item.add_marker(getattr(pytest.mark, _TIER_FILES.get(fname, "fast")))


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual CPU devices")
    return devs[:8]


@pytest.fixture(autouse=True)
def _bound_xla_cpu_accumulation(request):
    """Free compiled executables after each interpret-heavy Pallas test.

    One process accumulating ~30+ large interpret-mode kernel compiles
    reproducibly segfaults the XLA CPU compiler on the NEXT compile
    (observed twice at the same position in full-file runs of
    test_pallas_fused; every subset run passes).  Dropping the executable
    caches between these tests keeps the process under the threshold;
    each test compiles its own configs anyway, so nothing shared is
    lost."""
    yield
    if "pallas" in request.node.nodeid or "sharding" in request.node.nodeid:
        jax.clear_caches()
