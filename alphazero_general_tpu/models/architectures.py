"""Policy+value network architectures.

Re-designs the reference's torch models (reference:
alphazero/NNetArchitecture.py:36-162) in flax.linen, TPU-first:

* NHWC layout (XLA's native conv layout on TPU; observations arrive CHW to
  match the reference observation contract and are transposed once at entry);
* bfloat16 compute with float32 parameters and float32 softmax outputs;
* identical topology: 3x3 conv stem + BN, ``depth`` pre-activation residual
  blocks, 1x1-conv heads with MLPs; the value head is a **softmax distribution
  over num_players + has_draw** (NNetArchitecture.py:91, 120) — the gating and
  MCTS draw-credit math depend on this non-standard head (MCTS.pyx:291-295).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class Norm(nn.Module):
    """BatchNorm (reference parity) or GroupNorm (stateless, TPU-friendly)."""

    kind: str = "batchnorm"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        if self.kind == "batchnorm":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        return nn.GroupNorm(
            num_groups=None, group_size=min(16, x.shape[-1]),
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)


def _conv(features: int, kernel: int, dtype) -> nn.Conv:
    return nn.Conv(
        features, (kernel, kernel), padding="SAME", use_bias=False,
        dtype=dtype, param_dtype=jnp.float32,
    )


class ResidualBlock(nn.Module):
    """Pre-activation residual block (NNetArchitecture.py:36-66)."""

    channels: int
    norm: str
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        out = Norm(self.norm, self.dtype)(x, train)
        out = nn.relu(out)
        out = _conv(self.channels, 3, self.dtype)(out)
        out = Norm(self.norm, self.dtype)(out, train)
        out = nn.relu(out)
        out = _conv(self.channels, 3, self.dtype)(out)
        return out + x


class Mlp(nn.Module):
    """ELU MLP head (NNetArchitecture.py:20-32)."""

    layer_sizes: Sequence[int]
    output_size: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        for size in self.layer_sizes:
            x = nn.Dense(size, dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.elu(x)
        return nn.Dense(self.output_size, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


class ResNet(nn.Module):
    """AlphaZero-style tower (NNetArchitecture.py:69-120).

    Input: observations [B, C, H, W] float32 (reference layout).
    Output: (log-policy [B, A], log-value [B, value_size]) in float32.
    """

    action_size: int
    value_size: int
    num_channels: int = 32
    depth: int = 4
    value_head_channels: int = 16
    policy_head_channels: int = 16
    value_dense_layers: Sequence[int] = (512, 64)
    policy_dense_layers: Sequence[int] = (512, 256)
    norm: str = "batchnorm"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs, train: bool = False):
        x = jnp.transpose(obs, (0, 2, 3, 1)).astype(self.dtype)  # → NHWC
        x = _conv(self.num_channels, 3, self.dtype)(x)
        x = Norm(self.norm, self.dtype)(x, train)
        x = nn.relu(x)
        for _ in range(self.depth):
            x = ResidualBlock(self.num_channels, self.norm, self.dtype)(x, train)

        v = _conv(self.value_head_channels, 1, self.dtype)(x)
        v = Norm(self.norm, self.dtype)(v, train)
        v = v.reshape(v.shape[0], -1)
        v = Mlp(self.value_dense_layers, self.value_size, self.dtype)(v)

        pi = _conv(self.policy_head_channels, 1, self.dtype)(x)
        pi = Norm(self.norm, self.dtype)(pi, train)
        pi = pi.reshape(pi.shape[0], -1)
        pi = Mlp(self.policy_dense_layers, self.action_size, self.dtype)(pi)

        pi = nn.log_softmax(pi.astype(jnp.float32), axis=-1)
        v = nn.log_softmax(v.astype(jnp.float32), axis=-1)
        return pi, v


class FullyConnected(nn.Module):
    """Flat MLP variant (NNetArchitecture.py:123-162).

    Note: the reference computes its input size as ``sum(observation_size())``
    — a bug (C+H+W); we use the full flattened observation.
    """

    action_size: int
    value_size: int
    input_fc_layers: Sequence[int] = (1024,) * 4
    value_dense_layers: Sequence[int] = (512, 64)
    policy_dense_layers: Sequence[int] = (512, 256)
    norm: str = "batchnorm"  # unused; kept for config uniformity
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs, train: bool = False):
        x = obs.reshape(obs.shape[0], -1).astype(self.dtype)
        for size in self.input_fc_layers:
            x = nn.Dense(size, dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.relu(x)
        v = Mlp(self.value_dense_layers, self.value_size, self.dtype)(x)
        pi = Mlp(self.policy_dense_layers, self.action_size, self.dtype)(x)
        pi = nn.log_softmax(pi.astype(jnp.float32), axis=-1)
        v = nn.log_softmax(v.astype(jnp.float32), axis=-1)
        return pi, v


def build_model(env, args) -> nn.Module:
    """Model factory from args (reference: NNetWrapper.py:111-117)."""
    value_size = env.NUM_PLAYERS + int(env.HAS_DRAW)
    dtype = jnp.bfloat16 if args.get("compute_dtype", "bfloat16") == "bfloat16" \
        else jnp.float32
    if args.nnet_type == "resnet":
        return ResNet(
            action_size=env.ACTION_SIZE,
            value_size=value_size,
            num_channels=args.num_channels,
            depth=args.depth,
            value_head_channels=args.value_head_channels,
            policy_head_channels=args.policy_head_channels,
            value_dense_layers=tuple(args.value_dense_layers),
            policy_dense_layers=tuple(args.policy_dense_layers),
            norm=args.get("norm", "batchnorm"),
            dtype=dtype,
        )
    if args.nnet_type == "fc":
        return FullyConnected(
            action_size=env.ACTION_SIZE,
            value_size=value_size,
            input_fc_layers=tuple(args.input_fc_layers),
            value_dense_layers=tuple(args.value_dense_layers),
            policy_dense_layers=tuple(args.policy_dense_layers),
            dtype=dtype,
        )
    raise ValueError(f"Unknown nnet_type {args.nnet_type!r}")
