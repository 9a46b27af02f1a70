"""Int8 post-training quantization of the ResNet tower for inference.

Motivation (measured on TPU v5e, this repo's headline config — connect4,
B=2048, ResNet 128ch x 8 blocks): the bf16 forward already runs at ~95% of
the chip's bf16 MXU peak (~0.134 ms per 3x3 conv ≈ 190 TFLOP/s useful), and
it is 86% of the self-play simulation round. The only remaining headroom is
the MXU's 2x int8 path (measured 285 TOP/s vs 167 TFLOP/s on square
matmuls). This module converts a trained network's residual tower to int8
for *inference only* — training stays f32-params/bf16-compute.

Scheme (standard post-training static quantization):

* tower conv weights: symmetric per-output-channel int8
  (``ws[c] = max|W[..., c]| / 127``);
* tower conv inputs: symmetric per-tensor int8 with a *static* scale
  calibrated offline (max |activation| over a calibration batch) — static
  scales let the quantize step fuse into the preceding BN-affine + ReLU
  elementwise chain instead of paying a per-batch reduction;
* BatchNorm at inference is a per-channel affine (running stats); it stays
  in float and its scale folds together with the previous conv's dequant
  scale and the next quant scale, so each inter-conv elementwise chain is
  one fused multiply-add + ReLU + round + clip + cast;
* the stem conv (4 input channels — no MXU win) and both heads (<5% of
  FLOPs) stay in bf16, and the final log-softmax in f32, matching
  :class:`~alphazero_general_tpu.models.architectures.ResNet` outputs.

The quantized parameters are a pytree (:class:`QuantResNet`) usable exactly
like flax variables in the self-play ``apply_fn`` contract:
``quant_apply(qparams, obs) -> (log_pi, log_v)``.

Reference mapping: this accelerates NNetWrapper.process
(reference: alphazero/NNetWrapper.py:225-232) — the batched-inference hot
path that the reference runs in torch fp32 on GPU. The reference has no
quantized inference; this is a TPU-native production optimization. Search
semantics are unchanged (same MCTS math on slightly-perturbed priors);
strength parity is validated by an arena A/B (see tests + ROADMAP).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

BN_EPS = 1e-5  # flax.linen.BatchNorm default


@struct.dataclass
class QuantBlock:
    """One pre-activation residual block, quantized."""

    # Fused pre-conv1 affine: q1 = clip(round(relu(s1*x + b1)), 0, 127).
    # s1/b1 already include the 127/a1 quant scale.
    s1: jnp.ndarray  # f32[C]
    b1: jnp.ndarray  # f32[C]
    w1: jnp.ndarray  # int8[3, 3, C, C]
    # Fused post-conv1 affine feeding conv2's quantizer: includes conv1's
    # per-channel dequant (ws1 * a1/127), BN2's affine, and 127/a2.
    s2: jnp.ndarray  # f32[C]
    b2: jnp.ndarray  # f32[C]
    w2: jnp.ndarray  # int8[3, 3, C, C]
    d2: jnp.ndarray  # f32[C] — conv2 dequant back to the residual stream


@struct.dataclass
class QuantResNet:
    """Quantized-tower inference parameters (a jit-friendly pytree)."""

    stem_w: jnp.ndarray  # bf16[3, 3, Cin, C]
    stem_s: jnp.ndarray  # f32[C] BN affine
    stem_b: jnp.ndarray  # f32[C]
    blocks: Tuple[QuantBlock, ...]
    # Heads, bf16 (layout identical to architectures.ResNet).
    vh_w: jnp.ndarray  # bf16[1, 1, C, Hv]
    vh_s: jnp.ndarray  # f32[Hv]
    vh_b: jnp.ndarray  # f32[Hv]
    v_dense: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]
    ph_w: jnp.ndarray  # bf16[1, 1, C, Hp]
    ph_s: jnp.ndarray  # f32[Hp]
    ph_b: jnp.ndarray  # f32[Hp]
    p_dense: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]


def _bn_affine(params: dict, stats: dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BatchNorm running-stats inference as a per-channel (scale, bias)."""
    s = params["scale"] / jnp.sqrt(stats["var"] + BN_EPS)
    b = params["bias"] - stats["mean"] * s
    return s.astype(jnp.float32), b.astype(jnp.float32)


def _weight_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 weights; returns (wq, ws[Cout])."""
    ws = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    ws = jnp.maximum(ws, 1e-12)
    wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    return wq, ws.astype(jnp.float32)


def _conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def _conv_int8(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _mlp(x, layers, act=jax.nn.elu):
    for i, (k, b) in enumerate(layers):
        x = x @ k.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)
        if i + 1 < len(layers):
            x = act(x)
    return x


def _dense_layers(mlp_params: dict) -> Tuple:
    names = sorted(mlp_params, key=lambda n: int(n.split("_")[1]))
    return tuple((mlp_params[n]["kernel"], mlp_params[n]["bias"])
                 for n in names)


def _tower_calib_forward(variables, obs, depth: int):
    """bf16 forward over stem + tower mirroring the quantized structure;
    returns the max|activation| at each of the 2*depth quant points."""
    p, st = variables["params"], variables["batch_stats"]
    x = jnp.transpose(obs, (0, 2, 3, 1)).astype(jnp.bfloat16)
    x = _conv_bf16(x, p["Conv_0"]["kernel"])
    s0, b0 = _bn_affine(p["Norm_0"]["BatchNorm_0"], st["Norm_0"]["BatchNorm_0"])
    x = jnp.maximum(x.astype(jnp.float32) * s0 + b0, 0.0).astype(jnp.bfloat16)
    maxima = []
    for i in range(depth):
        bp, bs = p[f"ResidualBlock_{i}"], st[f"ResidualBlock_{i}"]
        s1, b1 = _bn_affine(bp["Norm_0"]["BatchNorm_0"],
                            bs["Norm_0"]["BatchNorm_0"])
        t = jnp.maximum(x.astype(jnp.float32) * s1 + b1, 0.0)
        maxima.append(jnp.max(t))
        h = _conv_bf16(t.astype(jnp.bfloat16), bp["Conv_0"]["kernel"])
        s2, b2 = _bn_affine(bp["Norm_1"]["BatchNorm_0"],
                            bs["Norm_1"]["BatchNorm_0"])
        t2 = jnp.maximum(h.astype(jnp.float32) * s2 + b2, 0.0)
        maxima.append(jnp.max(t2))
        h2 = _conv_bf16(t2.astype(jnp.bfloat16), bp["Conv_1"]["kernel"])
        x = x + h2
    return jnp.stack(maxima)


#: Module-level jit so per-iteration re-quantization in the Coach reuses the
#: compiled calibration forward instead of re-tracing every call.
_calib_forward_jit = jax.jit(_tower_calib_forward, static_argnames="depth")


def quantize_resnet(model, variables, calib_obs) -> QuantResNet:
    """Build int8 inference parameters from trained flax ``variables``.

    ``model`` is the :class:`architectures.ResNet` instance (for depth/norm);
    ``calib_obs`` is a float32 observation batch [Bc, C, H, W] used to set
    the static activation scales. Calibrate on observations from the actual
    self-play distribution when available (the Coach uses the previous
    iteration's replay samples); :func:`calibration_observations` (random
    playouts) is the cold-start fallback.
    """
    if model.norm != "batchnorm":
        raise ValueError("int8 quantization requires batchnorm running stats"
                         f" (norm={model.norm!r})")
    depth = model.depth
    maxima = _calib_forward_jit(variables, calib_obs, depth)
    maxima = jnp.maximum(maxima, 1e-6)

    p, st = variables["params"], variables["batch_stats"]
    s0, b0 = _bn_affine(p["Norm_0"]["BatchNorm_0"], st["Norm_0"]["BatchNorm_0"])

    blocks = []
    for i in range(depth):
        bp, bs = p[f"ResidualBlock_{i}"], st[f"ResidualBlock_{i}"]
        a1 = maxima[2 * i]
        a2 = maxima[2 * i + 1]
        s1, b1 = _bn_affine(bp["Norm_0"]["BatchNorm_0"],
                            bs["Norm_0"]["BatchNorm_0"])
        s2, b2 = _bn_affine(bp["Norm_1"]["BatchNorm_0"],
                            bs["Norm_1"]["BatchNorm_0"])
        w1q, ws1 = _weight_int8(bp["Conv_0"]["kernel"])
        w2q, ws2 = _weight_int8(bp["Conv_1"]["kernel"])
        q1 = 127.0 / a1
        q2 = 127.0 / a2
        d1 = ws1 * (a1 / 127.0)  # conv1 acc (int32) → float
        blocks.append(QuantBlock(
            s1=s1 * q1, b1=b1 * q1, w1=w1q,
            # feed conv2's quantizer: relu((acc*d1)*s2 + b2) * q2
            s2=(d1 * s2 * q2), b2=b2 * q2, w2=w2q,
            d2=ws2 * (a2 / 127.0),
        ))

    vh_s, vh_b = _bn_affine(p["Norm_1"]["BatchNorm_0"],
                            st["Norm_1"]["BatchNorm_0"])
    ph_s, ph_b = _bn_affine(p["Norm_2"]["BatchNorm_0"],
                            st["Norm_2"]["BatchNorm_0"])
    return QuantResNet(
        stem_w=p["Conv_0"]["kernel"].astype(jnp.bfloat16),
        stem_s=s0, stem_b=b0,
        blocks=tuple(blocks),
        vh_w=p["Conv_1"]["kernel"].astype(jnp.bfloat16),
        vh_s=vh_s, vh_b=vh_b,
        v_dense=_dense_layers(p["Mlp_0"]),
        ph_w=p["Conv_2"]["kernel"].astype(jnp.bfloat16),
        ph_s=ph_s, ph_b=ph_b,
        p_dense=_dense_layers(p["Mlp_1"]),
    )


def _quantize_act(t_scaled: jnp.ndarray) -> jnp.ndarray:
    """ReLU output already carries the 127/a scale; round+clip+cast."""
    return jnp.clip(jnp.round(t_scaled), 0.0, 127.0).astype(jnp.int8)


def quant_apply(qp: QuantResNet, obs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Int8-tower forward; drop-in for ``model.apply(variables, obs,
    train=False)`` → (log_pi [B, A], log_v [B, V]) float32."""
    x = jnp.transpose(obs, (0, 2, 3, 1)).astype(jnp.bfloat16)
    x = _conv_bf16(x, qp.stem_w)
    x = jnp.maximum(x.astype(jnp.float32) * qp.stem_s + qp.stem_b, 0.0)
    x = x.astype(jnp.bfloat16)  # residual stream in bf16

    for blk in qp.blocks:
        q1 = _quantize_act(
            jnp.maximum(x.astype(jnp.float32) * blk.s1 + blk.b1, 0.0))
        acc1 = _conv_int8(q1, blk.w1)
        q2 = _quantize_act(
            jnp.maximum(acc1.astype(jnp.float32) * blk.s2 + blk.b2, 0.0))
        acc2 = _conv_int8(q2, blk.w2)
        x = x + (acc2.astype(jnp.float32) * blk.d2).astype(jnp.bfloat16)

    v = _conv_bf16(x, qp.vh_w)
    v = (v.astype(jnp.float32) * qp.vh_s + qp.vh_b).astype(jnp.bfloat16)
    v = _mlp(v.reshape(v.shape[0], -1), qp.v_dense)
    pi = _conv_bf16(x, qp.ph_w)
    pi = (pi.astype(jnp.float32) * qp.ph_s + qp.ph_b).astype(jnp.bfloat16)
    pi = _mlp(pi.reshape(pi.shape[0], -1), qp.p_dense)

    log_pi = jax.nn.log_softmax(pi.astype(jnp.float32), axis=-1)
    log_v = jax.nn.log_softmax(v.astype(jnp.float32), axis=-1)
    return log_pi, log_v


#: (id(env), batch, moves) → jitted playout fn; envs are module singletons.
_calib_run_cache: dict = {}


def calibration_observations(env, rng, batch: int = 256, moves: int = 24):
    """Observations from random playouts — the cold-start calibration set.

    Plays ``moves`` uniformly-random (valid) moves from the initial position
    across ``batch`` parallel games with auto-reset, collecting every
    pre-move observation: [batch * moves, C, H, W] float32.
    """
    states = jax.vmap(lambda _: env.init())(jnp.arange(batch))
    key = (id(env), batch, moves)
    if key in _calib_run_cache:
        return _calib_run_cache[key](states, rng)

    @jax.jit
    def run(states, rng):
        def body(carry, r):
            st = carry
            obs = jax.vmap(env.observation)(st)
            valids = jax.vmap(env.valid_moves)(st)
            logits = jnp.where(valids, 0.0, -jnp.inf)
            act = jax.random.categorical(r, logits, axis=-1).astype(jnp.int32)
            nxt = jax.vmap(env.step)(st, act)
            win = jax.vmap(env.win_state)(nxt)
            done = jnp.any(win > 0, axis=-1)
            fresh = jax.vmap(lambda _: env.init())(jnp.arange(batch))
            def _sel(n, f):
                d = done.reshape((batch,) + (1,) * (n.ndim - 1))
                return jnp.where(d, f, n)
            return jax.tree_util.tree_map(_sel, nxt, fresh), obs

        _, obs = jax.lax.scan(body, states, jax.random.split(rng, moves))
        return obs.reshape((-1,) + obs.shape[2:])

    _calib_run_cache[key] = run
    return run(states, rng)
