"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the standard JAX trick for
exercising multi-chip sharding without hardware — SURVEY.md section 4),
regardless of any TPU attached to the session.  bench.py, NOT the tests,
runs on the real chip.
"""

import os

# Must happen before any jax backend is initialized.  The image's
# sitecustomize pre-registers the axon TPU plugin at interpreter startup
# (env vars alone are clobbered), so force the platform via jax.config
# before the first backend lookup.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is compile-bound on XLA:CPU (interpret-mode Pallas bodies are
# huge).  Backend opt level 0 skips LLVM -O2 on those bodies: measured
# 12-32% per-test compile savings, bit-identical results (it elides LLVM
# optimization passes, not math semantics).  CPU tests only — bench.py
# and the on-device selftest never import this file.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags
# Persistent compilation cache: the parity suite compiles many pyramid
# shapes; caching cuts repeat runs from ~15 min to seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_oft")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (the heavy parity/golden suites; "
             "default run stays under ~4 min cold — VERDICT r3 item 9)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: pass --runslow (nightly suite)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# XLA:CPU segfaults inside backend_compile_and_load once a single
# process accumulates enough loaded executables (reproduced at both
# backend opt levels, position-deterministic: the --runslow suite died
# at the ~65th test of test_pallas_kernels, and earlier when other
# modules' compiles preceded it; every crashing program compiles fine
# in a fresh process).  Dropping the Python references to the loaded
# executables every few tests keeps the client's loaded-code footprint
# bounded; the persistent disk cache (JAX_COMPILATION_CACHE_DIR above)
# makes the re-compiles after a clear cheap deserializations.
_CLEAR_EVERY = 8
_test_count = [0]


@pytest.fixture(autouse=True)
def _bound_loaded_executables():
    yield
    _test_count[0] += 1
    if _test_count[0] % _CLEAR_EVERY == 0:
        jax.clear_caches()
