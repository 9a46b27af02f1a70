"""Model + wrapper tests (reference test gap: the reference has none)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_general_tpu.envs.connect4 import Connect4
from alphazero_general_tpu.models import NNetWrapper, multistep_lr
from alphazero_general_tpu.utils.config import get_args


def tiny_args(**kw):
    base = dict(
        num_channels=8, depth=2, value_head_channels=4, policy_head_channels=4,
        value_dense_layers=[16], policy_dense_layers=[16],
        compute_dtype="float32",
    )
    base.update(kw)
    return get_args(**base)


class TestForward:
    def test_resnet_shapes_and_normalization(self):
        net = NNetWrapper(Connect4, tiny_args())
        obs = jnp.zeros((5, 4, 6, 7), jnp.float32)
        pi, v = net.process(obs)
        assert pi.shape == (5, 7)
        assert v.shape == (5, 3)  # players + draw softmax head
        np.testing.assert_allclose(np.asarray(pi).sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(v).sum(-1), 1.0, rtol=1e-5)

    def test_fc_variant(self):
        net = NNetWrapper(Connect4, tiny_args(
            nnet_type="fc", input_fc_layers=[32, 32]))
        pi, v = net.process(jnp.zeros((3, 4, 6, 7)))
        assert pi.shape == (3, 7) and v.shape == (3, 3)

    def test_predict_single(self):
        net = NNetWrapper(Connect4, tiny_args())
        obs = Connect4.observation(Connect4.init())
        pi, v = net.predict(obs)
        assert pi.shape == (7,) and v.shape == (3,)


class TestTrain:
    def test_loss_decreases_on_fixed_batch(self):
        net = NNetWrapper(Connect4, tiny_args(lr=0.05))
        rng = np.random.RandomState(0)
        obs = rng.rand(64, 4, 6, 7).astype(np.float32)
        tp = rng.rand(64, 7).astype(np.float32)
        tp /= tp.sum(-1, keepdims=True)
        tv = np.eye(3, dtype=np.float32)[rng.randint(0, 3, 64)]

        first = None
        for i in range(30):
            l_pi, l_v = net.train([(obs, tp, tv)], train_steps=1, iteration=1)
            if first is None:
                first = l_pi + l_v
        assert l_pi + l_v < first

    def test_batchnorm_stats_update(self):
        net = NNetWrapper(Connect4, tiny_args())
        before = jax.tree_util.tree_leaves(net.state.batch_stats)
        obs = np.random.rand(16, 4, 6, 7).astype(np.float32)
        tp = np.full((16, 7), 1 / 7, np.float32)
        tv = np.full((16, 3), 1 / 3, np.float32)
        net.train([(obs, tp, tv)], train_steps=2, iteration=0)
        after = jax.tree_util.tree_leaves(net.state.batch_stats)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )

    def test_multistep_lr(self):
        assert multistep_lr(0.01, [75, 125], 0.1, 1) == 0.01
        assert np.isclose(multistep_lr(0.01, [75, 125], 0.1, 80), 0.001)
        assert np.isclose(multistep_lr(0.01, [75, 125], 0.1, 200), 0.0001)


class TestCheckpoint:
    def test_roundtrip(self):
        net = NNetWrapper(Connect4, tiny_args())
        obs = jnp.ones((2, 4, 6, 7))
        pi_before, _ = net.process(obs)
        with tempfile.TemporaryDirectory() as d:
            net.save_checkpoint(d, "iteration-0000")
            # Perturb, then reload.
            net.state = net.state.replace(
                params=jax.tree_util.tree_map(lambda p: p + 1.0, net.state.params)
            )
            pi_mid, _ = net.process(obs)
            assert not np.allclose(np.asarray(pi_before), np.asarray(pi_mid))
            net.load_checkpoint(d, "iteration-0000")
            pi_after, _ = net.process(obs)
            np.testing.assert_allclose(
                np.asarray(pi_before), np.asarray(pi_after), rtol=1e-6
            )
            assert os.path.exists(os.path.join(d, "iteration-0000.json"))

    def test_from_checkpoint(self):
        net = NNetWrapper(Connect4, tiny_args(num_channels=16))
        with tempfile.TemporaryDirectory() as d:
            net.save_checkpoint(d, "iteration-0003")
            loaded = NNetWrapper.from_checkpoint(Connect4, d, "iteration-0003")
            assert loaded.args.num_channels == 16
            pi_a, _ = net.process(jnp.ones((2, 4, 6, 7)))
            pi_b, _ = loaded.process(jnp.ones((2, 4, 6, 7)))
            np.testing.assert_allclose(np.asarray(pi_a), np.asarray(pi_b),
                                       rtol=1e-6)


def test_checkpoint_load_restores_device_arrays(tmp_path):
    """from_bytes yields numpy leaves; load_checkpoint must commit them to
    device arrays — numpy params make every jitted consumer re-upload the
    full parameter set per call (measured 168 MB/move over the TPU tunnel
    in gated self-play; it oom-killed the r4 strength run)."""
    import jax

    from alphazero_general_tpu.envs import get_env
    from alphazero_general_tpu.models import NNetWrapper
    from alphazero_general_tpu.utils.config import get_args

    env = get_env("tictactoe")
    args = get_args(run_name="ckptdev", num_channels=8, depth=1,
                    value_head_channels=2, policy_head_channels=2,
                    value_dense_layers=[8], policy_dense_layers=[8])
    net = NNetWrapper(env, args)
    net.save_checkpoint(str(tmp_path), "it1")
    net2 = NNetWrapper(env, args)
    net2.load_checkpoint(str(tmp_path), "it1")
    leaves = jax.tree_util.tree_leaves(net2.state)
    assert all(isinstance(l, jax.Array) for l in leaves), \
        sorted({type(l).__name__ for l in leaves})
    qp, _ = net2.quantized_inference() if net2.model.norm == "batchnorm" \
        else (None, None)
    if qp is not None:
        qleaves = jax.tree_util.tree_leaves(qp)
        assert all(isinstance(l, jax.Array) for l in qleaves), \
            sorted({type(l).__name__ for l in qleaves})
