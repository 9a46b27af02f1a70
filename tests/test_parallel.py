"""Mesh/sharding tests on the 8-device virtual CPU mesh (conftest.py)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_general_tpu.envs.connect4 import Connect4
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    replicate_tree,
    shard_leading_axis,
)
from alphazero_general_tpu.utils.config import get_args

# Integration tier: full Coach cycles / sweeps — deselect with -m 'not slow' for the quick tier.
pytestmark = pytest.mark.slow


def tiny_net():
    args = get_args(
        num_channels=8, depth=1, value_head_channels=2, policy_head_channels=2,
        value_dense_layers=[8], policy_dense_layers=[8],
        compute_dtype="float32",
    )
    return NNetWrapper(Connect4, args)


class TestSharding:
    def test_mesh_has_8_devices(self):
        mesh = make_mesh()
        assert len(mesh.devices.reshape(-1)) == 8

    def test_sharded_train_step_matches_single_device(self):
        net = tiny_net()
        rng = np.random.RandomState(0)
        B = 32
        batch = (
            rng.rand(B, 4, 6, 7).astype(np.float32),
            np.full((B, 7), 1 / 7, np.float32),
            np.full((B, 3), 1 / 3, np.float32),
        )
        jbatch = tuple(jnp.asarray(x) for x in batch)

        # Single-device result.
        state1, (l_pi_1, l_v_1) = net._jit_train_step(net.state, jbatch, 1e-2)

        # Sharded over 8 devices.
        mesh = make_mesh(8)
        step = make_sharded_train_step(net, mesh)
        state_r = replicate_tree(net.state, mesh)
        batch_s = shard_leading_axis(jbatch, mesh)
        with mesh:
            state8, (l_pi_8, l_v_8) = step(state_r, batch_s, 1e-2)

        np.testing.assert_allclose(float(l_pi_1), float(l_pi_8), rtol=1e-5)
        np.testing.assert_allclose(float(l_v_1), float(l_v_8), rtol=1e-5)
        # Updated params must agree (grad psum == full-batch grad).
        a = jax.tree_util.tree_leaves(state1.params)
        b = jax.tree_util.tree_leaves(state8.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-4, atol=1e-6
            )

    def test_dryrun_multichip(self):
        # Run in a FRESH subprocess: the dryrun compiles ~30 distinct XLA
        # programs (3 Coach cycles + sharded segmented searches), and XLA's
        # CPU compiler has been observed to segfault (flakily) when those
        # compiles land on top of the full suite's accumulated compiler
        # state in-process. A clean interpreter reproduces exactly what the
        # driver does when it invokes dryrun_multichip.
        import subprocess
        import sys

        # Shared bootstrap module (tests/_cpu_mesh_bootstrap.py) — the same
        # CPU/8-virtual-device setup conftest.py applies, one source of
        # truth so the subprocess cannot drift from the suite config.
        prog = (
            "import sys\n"
            "sys.path.insert(0, '/root/repo')\n"
            "sys.path.insert(0, '/root/repo/tests')\n"
            "import _cpu_mesh_bootstrap\n"
            "import __graft_entry__ as ge\n"
            "ge.dryrun_multichip(8)\n"
        )
        res = subprocess.run(
            [sys.executable, "-c", prog],
            capture_output=True, text=True, timeout=1800,
            cwd="/root/repo",
        )
        assert res.returncode == 0, (
            f"dryrun_multichip subprocess failed "
            f"(rc={res.returncode})\nstdout:\n{res.stdout[-4000:]}\n"
            f"stderr:\n{res.stderr[-4000:]}"
        )
        assert "dryrun_multichip(8) OK" in res.stdout
