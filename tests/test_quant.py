"""Int8 quantized inference (models/quant.py): accuracy vs the bf16 model.

The quantized tower must approximate the bf16 forward closely enough that
MCTS priors/values — and therefore play strength — are preserved. These
tests pin the approximation quality on randomly-initialized and
randomly-perturbed nets (CPU; the TPU speed win is benchmarked separately).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_general_tpu.envs import get_env
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.models.quant import (
    calibration_observations, quant_apply, quantize_resnet,
)
from alphazero_general_tpu.utils.config import get_args


def _make_net(env, seed=0, **kw):
    args = get_args(num_channels=32, depth=3, value_head_channels=8,
                    policy_head_channels=8, value_dense_layers=[64],
                    policy_dense_layers=[64], seed=seed, **kw)
    return NNetWrapper(env, args)


def _train_briefly(env, net, rng, steps=25):
    """A few real train steps so BN stats/weights are non-trivial but sane
    (unbounded random perturbation of BN stats decouples them from the true
    activation distribution and explodes the tower — not a real model)."""
    obs = calibration_observations(env, rng, batch=64, moves=4)
    k1, k2 = jax.random.split(jax.random.fold_in(rng, 1))
    B = obs.shape[0]
    pi = jax.nn.softmax(jax.random.normal(k1, (B, env.ACTION_SIZE)), -1)
    v = jax.nn.softmax(jax.random.normal(k2, (B, 3)), -1)
    net.train([(obs, pi, v)], train_steps=steps)
    return net


class TestQuantAccuracy:
    def test_policy_value_close(self):
        env = get_env("connect4")
        net = _make_net(env)
        rng = jax.random.PRNGKey(1)
        calib = calibration_observations(env, rng, batch=64, moves=12)
        qp = quantize_resnet(net.model, net.state.variables, calib)

        obs = calibration_observations(env, jax.random.PRNGKey(2),
                                       batch=64, moves=6)
        logp_q, logv_q = jax.jit(quant_apply)(qp, obs)
        logp_f, logv_f = net.model.apply(net.state.variables, obs,
                                         train=False)
        pi_q, pi_f = np.exp(logp_q), np.exp(logp_f)
        v_q, v_f = np.exp(logv_q), np.exp(logv_f)
        # Mean KL(bf16 || int8) over the batch must be tiny.
        kl = np.mean(np.sum(pi_f * (logp_f - logp_q), axis=-1))
        assert kl < 5e-3, kl
        assert np.max(np.abs(v_q - v_f)) < 0.05
        # Priors rank-consistent for the overwhelming majority.
        agree = np.mean(np.argmax(pi_q, -1) == np.argmax(pi_f, -1))
        assert agree > 0.97, agree

    @pytest.mark.slow
    def test_trained_net_still_close(self):
        env = get_env("tictactoe")
        net = _make_net(env, seed=3)
        net = _train_briefly(env, net, jax.random.PRNGKey(4))
        variables = net.state.variables
        calib = calibration_observations(env, jax.random.PRNGKey(5),
                                         batch=64, moves=8)
        qp = quantize_resnet(net.model, variables, calib)
        obs = calibration_observations(env, jax.random.PRNGKey(6),
                                       batch=32, moves=4)
        logp_q, logv_q = jax.jit(quant_apply)(qp, obs)
        logp_f, logv_f = net.model.apply(variables, obs, train=False)
        pi_f = np.exp(logp_f)
        kl = np.mean(np.sum(pi_f * (logp_f - logp_q), axis=-1))
        assert kl < 2e-2, kl

    def test_wrapper_entry_point(self):
        env = get_env("connect4")
        net = _make_net(env)
        qp, apply_fn = net.quantized_inference()
        obs = calibration_observations(env, jax.random.PRNGKey(7),
                                       batch=16, moves=2)
        logp, logv = apply_fn(qp, obs)
        assert logp.shape == (32, env.ACTION_SIZE)
        assert logv.shape == (32, 3)
        np.testing.assert_allclose(np.sum(np.exp(logp), -1), 1.0, rtol=1e-3)

    def test_groupnorm_rejected(self):
        env = get_env("connect4")
        net = _make_net(env, norm="groupnorm")
        with pytest.raises(ValueError):
            net.quantized_inference()

    def test_selfplay_with_quantized_eval(self):
        """The quantized apply_fn drops into the jitted self-play move."""
        from alphazero_general_tpu.selfplay.selfplay import (
            SelfPlayConfig, init_selfplay, make_move_fns,
        )
        env = get_env("tictactoe")
        net = _make_net(env, seed=8)
        qp, apply_fn = net.quantized_inference()
        cfg = SelfPlayConfig(
            sims_full=8, sims_fast=4,
            spec=SelfPlayConfig().spec._replace(
                num_players=env.NUM_PLAYERS, has_draw=env.HAS_DRAW),
        )
        fns = make_move_fns(env, cfg, apply_fn)
        carry = init_selfplay(env, 8, 1.0)
        carry, rec = fns["full"](qp, carry, jax.random.PRNGKey(9))
        assert rec.action.shape == (8,)
        assert np.all(np.asarray(rec.pi) >= 0)
