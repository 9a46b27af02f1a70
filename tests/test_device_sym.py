"""Device-side train-step symmetries (VERDICT r3 item 5).

The train step can apply one random symmetry per drawn sample on device
(NNetWrapper.set_device_symmetries) instead of materializing the 8x
host-expanded window the way the reference does (Coach.py:375-381). These
tests pin the equivalence: for every symmetry index s, the device-prepped
batch row equals the host `_expand_symmetries` row, and a Coach cycle run
with deviceSymmetries on/off trains on the same sample distribution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.selfplay.replay import _expand_symmetries


@pytest.mark.parametrize("env_name", ["connect4", "brandubh"])
def test_prep_batch_matches_host_expansion(env_name):
    env = get_env(env_name)
    S = env.NUM_SYMMETRIES
    assert S > 1
    rng = np.random.default_rng(0)
    n = 6
    obs = rng.random((n,) + tuple(env.OBS_SHAPE)).astype(np.float16)
    pi = rng.random((n, env.ACTION_SIZE)).astype(np.float16)
    pi /= pi.sum(axis=1, keepdims=True)
    val = rng.random((n, env.NUM_PLAYERS + int(env.HAS_DRAW))).astype(
        np.float32)

    host_obs, host_pi = _expand_symmetries(env, obs, pi)  # [n*S, ...] f32

    from alphazero_general_tpu.models import NNetWrapper
    from alphazero_general_tpu.utils.config import get_args

    args = get_args(run_name="dsym", nnet_type="fc", depth=1, num_channels=8,
                    value_dense_layers=[16], policy_dense_layers=[16])
    net = NNetWrapper(env, args)
    net.set_device_symmetries(env)
    prep = jax.jit(net._prep_batch)

    for s in range(S):
        sym = np.full((n,), s, np.int32)
        o, p, v = prep((jnp.asarray(obs), jnp.asarray(pi),
                        jnp.asarray(val), jnp.asarray(sym)))
        # Host path expands f16 inputs to f32 output; device path casts the
        # same f16 to f32 then gathers — identical values, modulo layout.
        np.testing.assert_array_equal(
            np.asarray(o), host_obs[s::S].astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(p), host_pi[s::S].astype(np.float32))
        np.testing.assert_array_equal(np.asarray(v), val)


def test_prep_batch_identity_without_sym_env():
    env = get_env("connect4")
    from alphazero_general_tpu.models import NNetWrapper
    from alphazero_general_tpu.utils.config import get_args

    args = get_args(run_name="dsym2", nnet_type="fc", depth=1,
                    num_channels=8, value_dense_layers=[16],
                    policy_dense_layers=[16])
    net = NNetWrapper(env, args)
    assert net._sym_env is None
    rng = np.random.default_rng(1)
    obs = rng.random((4,) + tuple(env.OBS_SHAPE)).astype(np.float16)
    pi = rng.random((4, env.ACTION_SIZE)).astype(np.float16)
    val = rng.random((4, 3)).astype(np.float32)
    o, p, v = net._prep_batch((jnp.asarray(obs), jnp.asarray(pi),
                               jnp.asarray(val)))
    assert o.dtype == jnp.float32 and p.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(o), obs.astype(np.float32))


def test_train_runs_on_raw_sym_batches():
    """One gradient step on a 4-tuple raw batch executes and changes params."""
    env = get_env("connect4")
    from alphazero_general_tpu.models import NNetWrapper
    from alphazero_general_tpu.utils.config import get_args

    args = get_args(run_name="dsym3", num_channels=8, depth=2,
                    value_head_channels=4, policy_head_channels=4,
                    value_dense_layers=[16], policy_dense_layers=[16],
                    train_batch_size=8)
    net = NNetWrapper(env, args)
    net.set_device_symmetries(env)
    rng = np.random.default_rng(2)
    S = env.NUM_SYMMETRIES

    def batches():
        while True:
            obs = rng.random((8,) + tuple(env.OBS_SHAPE)).astype(np.float16)
            pi = np.full((8, env.ACTION_SIZE), 1 / env.ACTION_SIZE,
                         np.float16)
            val = np.full((8, 3), 1 / 3, np.float32)
            sym = rng.integers(0, S, size=8, dtype=np.int32)
            yield obs, pi, val, sym

    before = jax.tree_util.tree_leaves(net.state.params)[0].copy()
    l_pi, l_v = net.train(batches(), train_steps=2, iteration=1)
    after = jax.tree_util.tree_leaves(net.state.params)[0]
    assert np.isfinite(l_pi) and np.isfinite(l_v)
    assert not np.allclose(before, after)


def test_coach_window_raw_vs_expanded_equivalence(tmp_path):
    """load_window(expand=False) keeps raw rows whose expansion equals the
    expand=True result (same subsample fraction, same rows)."""
    from alphazero_general_tpu.selfplay.replay import ReplayStore

    env = get_env("brandubh")
    store = ReplayStore(str(tmp_path), "rawwin")
    rng = np.random.default_rng(3)
    for it in (1, 2):
        w = store.writer(it, env.OBS_SHAPE, env.ACTION_SIZE, 3, raw=True)
        obs = rng.random((5,) + tuple(env.OBS_SHAPE)).astype(np.float16)
        pi = rng.random((5, env.ACTION_SIZE)).astype(np.float16)
        val = rng.random((5, 3)).astype(np.float32)
        w.append(obs, pi, val)
        w.close()
    raw = store.load_window(1, 2, symmetric_env=env, expand=False)
    exp = store.load_window(1, 2, symmetric_env=env, expand=True)
    S = env.NUM_SYMMETRIES
    assert len(raw[0]) * S == len(exp[0])
    # Row i of the raw window expands to rows [i*S, (i+1)*S) of the expanded
    # window (load_window expands in place, preserving order).
    ro, rp = _expand_symmetries(env, raw[0], raw[1])
    np.testing.assert_allclose(ro, exp[0], rtol=0, atol=2e-3)
    np.testing.assert_allclose(rp, exp[1], rtol=0, atol=2e-3)
    np.testing.assert_array_equal(np.repeat(raw[2], S, axis=0), exp[2])
