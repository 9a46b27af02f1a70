"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-native analogue of "multi-node without a cluster"
(SURVEY.md §4): the same jitted/sharded programs that run on a TPU slice are
validated on 8 virtual CPU devices.

Note: this container's sitecustomize registers the axon TPU backend and sets
JAX_PLATFORMS=axon before pytest starts, so plain env vars are not enough —
we must override the jax config directly (the TPU tunnel admits one process;
tests must never grab it or they deadlock against a running bench).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cpu_mesh_bootstrap  # noqa: F401, E402  (single source of truth)
