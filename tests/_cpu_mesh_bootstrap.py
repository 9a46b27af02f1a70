"""Single source of truth for the CPU virtual-mesh test bootstrap.

Importing this module forces JAX onto the host CPU backend with
``AZG_TEST_DEVICE_COUNT`` (default 8) virtual devices — the configuration
conftest.py applies to the whole suite and subprocess-based tests
(test_parallel.py dryrun) must reproduce exactly. This container's
sitecustomize registers the axon TPU backend and sets JAX_PLATFORMS=axon in
every process, so plain env vars are not enough: the jax config must be
updated after import (and tests must never touch the TPU tunnel — it
admits one process, and grabbing it deadlocks against a running bench).
"""

import os

_count = int(os.environ.get("AZG_TEST_DEVICE_COUNT", "8"))
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={_count}"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache for the CPU test backend: the suite is
# compile-dominated (hundreds of small jitted search programs), so warm runs
# are several times faster. Default on under tests/; AZG_TEST_CACHE=""
# disables, or points at a different directory.
_cache = os.environ.get(
    "AZG_TEST_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".test_jax_cache"))
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
