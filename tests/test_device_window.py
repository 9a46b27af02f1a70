"""Device-resident replay window (selfplay/device_window.py).

Covers the ring mechanics (wrap, eviction, stable index order), the
bit-equality of window-mode training vs the host feed on the same index
sequence, and the Coach-level guarantee: with no window cap in play, a Coach
run with deviceWindow=True consumes the SAME random draws and trains on the
SAME batches as the host feed — final parameters are identical.
"""

import numpy as np
import pytest

from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models.wrapper import NNetWrapper
from alphazero_general_tpu.selfplay.device_window import DeviceWindow
from alphazero_general_tpu.utils.config import get_args


def _rows(n, obs_shape=(1, 2, 2), a=4, v=3, seed=0):
    rng = np.random.default_rng(seed)
    obs = rng.standard_normal((n,) + obs_shape).astype(np.float16)
    pi = rng.random((n, a)).astype(np.float16)
    val = rng.random((n, v)).astype(np.float32)
    return obs, pi, val


def test_ring_basic_roundtrip():
    w = DeviceWindow((1, 2, 2), 4, 3, rows=16, chunk=4)
    obs, pi, val = _rows(6)
    w.add_iteration(1, obs, pi, val)
    idx = w.indices_for(1, 1)
    assert len(idx) == 6
    np.testing.assert_array_equal(
        np.asarray(w.obs)[idx], obs)
    np.testing.assert_array_equal(np.asarray(w.pi)[idx], pi)
    np.testing.assert_array_equal(np.asarray(w.val)[idx], val)


def test_ring_wrap_evicts_oldest():
    w = DeviceWindow((1, 2, 2), 4, 3, rows=8, chunk=4)
    r1 = _rows(4, seed=1)
    r2 = _rows(4, seed=2)
    r3 = _rows(4, seed=3)
    w.add_iteration(1, *r1)
    w.add_iteration(2, *r2)
    assert w.cursor == 8
    w.add_iteration(3, *r3)  # wraps to 0, overwriting iteration 1
    assert not w.has_iteration(1)
    assert w.has_iteration(2)
    idx3 = w.indices_for(3, 3)
    np.testing.assert_array_equal(np.asarray(w.obs)[idx3], r3[0])
    idx2 = w.indices_for(2, 2)
    np.testing.assert_array_equal(np.asarray(w.obs)[idx2], r2[0])


def test_ring_padding_does_not_corrupt_neighbors():
    # A 3-row upload pads to one 4-row chunk; the pad row must be evicted
    # from whatever segment held that physical slot, never aliased.
    w = DeviceWindow((1, 2, 2), 4, 3, rows=8, chunk=4)
    r1 = _rows(4, seed=1)
    w.add_iteration(1, *r1)
    r2 = _rows(3, seed=2)
    w.add_iteration(2, *r2)
    assert w.cursor == 8
    assert len(w.indices_for(1, 2)) == 7
    r3 = _rows(3, seed=3)
    w.add_iteration(3, *r3)  # wrap: overwrites iteration 1's rows 0..3
    assert not w.has_iteration(1)
    np.testing.assert_array_equal(
        np.asarray(w.obs)[w.indices_for(2, 2)], r2[0])
    np.testing.assert_array_equal(
        np.asarray(w.obs)[w.indices_for(3, 3)], r3[0])


def test_drop_before():
    w = DeviceWindow((1, 2, 2), 4, 3, rows=16, chunk=4)
    for it in (1, 2, 3):
        w.add_iteration(it, *_rows(2, seed=it))
    w.drop_before(3)
    assert [it for it in (1, 2, 3) if w.has_iteration(it)] == [3]


def test_window_train_bit_equal_to_host_feed():
    """Same index sequence, same f16 rows: the window-mode step and the
    host-feed step must produce identical parameters."""
    env = get_env("connect4")
    args = get_args(num_channels=8, depth=1, train_batch_size=8, lr=0.01)
    obs_shape = tuple(env.OBS_SHAPE)
    A, V = env.ACTION_SIZE, env.NUM_PLAYERS + int(env.HAS_DRAW)
    n = 32
    rng = np.random.default_rng(5)
    obs = rng.standard_normal((n,) + obs_shape).astype(np.float16)
    pi = rng.random((n, A)).astype(np.float16)
    pi /= pi.sum(axis=1, keepdims=True)
    pi = pi.astype(np.float16)
    val = np.eye(V, dtype=np.float32)[rng.integers(0, V, n)]

    steps = 3
    idx_seq = [rng.integers(0, n, 8).astype(np.int32) for _ in range(steps)]
    sym_seq = [rng.integers(0, env.NUM_SYMMETRIES, 8).astype(np.int32)
               for _ in range(steps)]

    host = NNetWrapper(env, args)
    host.set_device_symmetries(env)
    host_batches = [(obs[i], pi[i], val[i], s)
                    for i, s in zip(idx_seq, sym_seq)]
    host.train(iter(host_batches), steps)

    win = NNetWrapper(env, args)
    win.set_device_symmetries(env)
    win.set_device_window(True)
    ring = DeviceWindow(obs_shape, A, V, rows=n, chunk=8)
    ring.add_iteration(1, obs, pi, val)
    phys = ring.indices_for(1, 1)
    win_batches = [ring.buffers + (phys[i], s)
                   for i, s in zip(idx_seq, sym_seq)]
    win.train(iter(win_batches), steps)

    import jax

    for a, b in zip(jax.tree_util.tree_leaves(host.state.params),
                    jax.tree_util.tree_leaves(win.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_coach_device_window_matches_host_feed(tmp_path):
    """End-to-end: identical Coach runs with deviceWindow on/off produce
    identical parameters (same RNG draws, same batches — the window only
    moves the row gather on device)."""
    from alphazero_general_tpu.train.coach import Coach

    env = get_env("tictactoe")

    def run(dev_window: bool, name: str):
        args = get_args(
            run_name=name,
            checkpoint=str(tmp_path / "ckpt"),
            data=str(tmp_path / "data"),
            log_dir=str(tmp_path / "runs"),
            numIters=2,
            numWarmupIters=1,
            process_batch_size=8,
            gamesPerIteration=8,
            numMCTSSims=5, numFastSims=3, probFastSim=0.5,
            numWarmupSims=3,
            train_batch_size=16,
            autoTrainSteps=False, train_steps_per_iteration=4,
            compareWithBaseline=False, compareWithPast=False,
            num_channels=8, depth=1,
            value_dense_layers=[16], policy_dense_layers=[16],
            quant_selfplay=False,
            deviceWindow=dev_window,
            seed=3,
        )
        net = NNetWrapper(env, args)
        Coach(env, net, args).learn()
        return net.state.params

    p_host = run(False, "host_feed")
    p_win = run(True, "dev_window")
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(p_host),
                    jax.tree_util.tree_leaves(p_win)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
