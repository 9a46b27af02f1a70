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
