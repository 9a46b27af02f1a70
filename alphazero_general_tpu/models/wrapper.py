"""Network lifecycle: init / train / eval / checkpoint.

The TPU-native counterpart of the reference's NNetWrapper (reference:
alphazero/NNetWrapper.py:86-282). Differences by design:

* state is an explicit immutable pytree (`NetState`) — params, batch stats,
  optimizer state and step counter — so two models (train + gated self-play,
  Coach.py:158-181) are just two pytrees, swappable on device without copies;
* `process` (batched eval, NNetWrapper.py:225-232) is a pure jitted function
  usable *inside* other jitted programs — the self-play search calls it
  directly rather than through shared-memory tensors;
* checkpoints carry params+opt+step and the full args (NNetWrapper.py:240-250)
  as msgpack + JSON.
"""

from __future__ import annotations

import os
from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct

from alphazero_general_tpu.models.architectures import build_model
from alphazero_general_tpu.utils.config import Args, get_args


@struct.dataclass
class NetState:
    params: dict
    batch_stats: dict
    opt_state: object
    step: jnp.ndarray  # int32 total train steps

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def multistep_lr(base_lr: float, milestones, gamma: float, iteration: int) -> float:
    """MultiStepLR stepped once per training iteration
    (reference: Coach.py:89-98, NNetWrapper.py:197-200)."""
    passed = sum(1 for m in milestones if iteration >= m)
    return base_lr * (gamma ** passed)


class NNetWrapper:
    """Holds the model definition + current NetState for one logical network."""

    def __init__(self, env, args: Args):
        self.env = env
        self.args = args
        self.model = build_model(env, args)
        self.value_size = env.NUM_PLAYERS + int(env.HAS_DRAW)

        opt_args = args.get("optimizer_args", Args())
        wd = float(opt_args.get("weight_decay", 0.0))
        momentum = float(opt_args.get("momentum", 0.0))
        nesterov = bool(opt_args.get("nesterov", False))
        # torch.optim.SGD semantics: grad += wd * param, then momentum buffer,
        # then params -= lr * buf. lr is injected per-step so the per-iteration
        # scheduler can adjust it without rebuilding optimizer state.
        self.tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.trace(decay=momentum, nesterov=nesterov)
            if momentum else optax.identity(),
        )

        rng = jax.random.PRNGKey(int(args.get("seed", 0)))
        obs_spec = jnp.zeros((1,) + tuple(env.OBS_SHAPE), jnp.float32)
        variables = self.model.init(rng, obs_spec, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.state = NetState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            step=jnp.int32(0),
        )
        self._jit_train_step = jax.jit(self._train_step)
        self._jit_process = jax.jit(self._process)
        self.mesh = None
        self.elapsed_time = 0.0
        self.l_pi = 0.0
        self.l_v = 0.0

    def attach_mesh(self, mesh) -> None:
        """Run training data-parallel over ``mesh``: params/opt state
        replicated, batches sharded on their leading axis, gradient psum over
        ICI inserted by XLA (the TPU replacement for the reference's
        single-GPU learner fed by DataLoader workers, Coach.py:466-469).
        Call once after construction; checkpoint loads re-replicate."""
        from alphazero_general_tpu.parallel.mesh import (
            make_sharded_train_step, replicate_tree,
        )

        self.mesh = mesh
        if mesh is None:
            self._jit_train_step = jax.jit(self._train_step)
            return
        self._jit_train_step = make_sharded_train_step(self, mesh)
        self.state = replicate_tree(self.state, mesh)

    # ------------------------------------------------------------------ eval
    def _process(self, variables, obs):
        """Batched eval → (policy probs [B, A], value probs [B, V])
        (NNetWrapper.py:225-232)."""
        logp, logv = self.model.apply(variables, obs, train=False)
        return jnp.exp(logp), jnp.exp(logv)

    def process(self, obs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._jit_process(self.state.variables, obs)

    def predict(self, obs) -> Tuple[np.ndarray, np.ndarray]:
        """Single observation (NNetWrapper.py:207-223)."""
        pi, v = self.process(jnp.asarray(obs)[None])
        return np.asarray(pi[0]), np.asarray(v[0])

    def make_eval_fn(self):
        """EvalFn over the *current* state for use inside jitted search."""
        variables = self.state.variables

        def eval_fn(obs):
            logp, logv = self.model.apply(variables, obs, train=False)
            return jnp.exp(logp), jnp.exp(logv)

        return eval_fn

    def quantized_inference(self, calib_obs=None, rng=None):
        """Int8-tower inference parameters + apply fn (see models/quant.py).

        Returns ``(qparams, apply_fn)`` where ``apply_fn(qparams, obs) ->
        (log_pi, log_v)`` — the same contract as ``model.apply`` inside the
        self-play move programs, so gated-model swaps stay pointer swaps.
        Re-call after each training iteration to refresh weights/scales.
        Raises ValueError for architectures without a quantized path
        (fc nets, groupnorm towers).
        """
        from alphazero_general_tpu.models.architectures import ResNet
        from alphazero_general_tpu.models.quant import (
            calibration_observations, quant_apply, quantize_resnet,
        )

        if not isinstance(self.model, ResNet):
            raise ValueError("quantized inference supports ResNet only")
        if self.model.norm != "batchnorm":
            # Checked before the (relatively expensive) calibration playouts.
            raise ValueError("int8 quantization requires batchnorm running"
                             f" stats (norm={self.model.norm!r})")
        if calib_obs is None:
            if rng is None:
                rng = jax.random.PRNGKey(int(self.args.get("seed", 0)))
            calib_obs = calibration_observations(self.env, rng)
        qp = quantize_resnet(self.model, self.state.variables, calib_obs)
        return qp, quant_apply

    # ----------------------------------------------------------------- train
    def _loss(self, params, batch_stats, batch, train: bool = True):
        obs, target_pi, target_v = batch
        variables = {"params": params, "batch_stats": batch_stats}
        if train and batch_stats:
            (logp, logv), mutated = self.model.apply(
                variables, obs, train=True, mutable=["batch_stats"]
            )
            new_stats = mutated["batch_stats"]
        else:
            logp, logv = self.model.apply(variables, obs, train=False)
            new_stats = batch_stats
        # CE on distributions (NNetWrapper.py:234-238).
        l_pi = -jnp.mean(jnp.sum(target_pi * logp, axis=-1))
        l_v = -jnp.mean(jnp.sum(target_v * logv, axis=-1))
        l_v = l_v * self.args.value_loss_weight
        return l_pi + l_v, (l_pi, l_v, new_stats)

    def _train_step(self, state: NetState, batch, lr):
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        (_, (l_pi, l_v, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        return NetState(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
        ), (l_pi, l_v)

    def current_lr(self, iteration: int) -> float:
        sched = self.args.get("scheduler", "multistep")
        if sched == "multistep":
            sa = self.args.get("scheduler_args", Args())
            return multistep_lr(
                self.args.lr, sa.get("milestones", []), sa.get("gamma", 1.0),
                iteration,
            )
        return self.args.lr

    def train(self, batches: Iterable, train_steps: int, iteration: int = 0,
              callback=None) -> Tuple[float, float]:
        """Step-capped loop over a batch iterable (NNetWrapper.py:123-205).

        ``batches`` yields (obs, target_pi, target_v) numpy/JAX arrays.
        """
        from collections import deque

        lr = self.current_lr(iteration)
        pi_sum = v_sum = 0.0
        count = 0
        step = 0
        # Pipelined loop: loss scalars are read PIPE steps behind the
        # dispatch frontier so host→device batch transfers overlap prior
        # steps' execution instead of serializing transfer→step→sync each
        # iteration (measured 0.83 s/step at tafl batch scale over the TPU
        # tunnel with the synchronous loop).
        PIPE = 16
        pend: deque = deque()

        def _drain_one():
            nonlocal pi_sum, v_sum, count
            s, a, b = pend.popleft()
            pi_sum += float(a)
            v_sum += float(b)
            count += 1
            if callback is not None:
                callback(s, train_steps, pi_sum / count, v_sum / count)

        def _to_device(batch):
            if self.mesh is not None:
                from alphazero_general_tpu.parallel.mesh import (
                    host_local_to_global,
                )

                n_dev = self.mesh.devices.size
                rows = (len(batch[0]) // n_dev) * n_dev
                if rows == 0:
                    return None  # batch too small to shard evenly
                if rows != len(batch[0]):
                    batch = tuple(x[:rows] for x in batch)
                return host_local_to_global(
                    tuple(jnp.asarray(x, jnp.float32)
                          for x in batch), self.mesh)
            # f32 regardless of the store's (f16) sample dtype —
            # CE/log math must not run in half precision.
            return tuple(jnp.asarray(x, jnp.float32) for x in batch)

        while step < train_steps:
            progressed = False
            for batch in batches:
                if step >= train_steps:
                    break
                batch = _to_device(batch)
                if batch is None:
                    continue
                self.state, (l_pi, l_v) = self._jit_train_step(
                    self.state, batch, lr
                )
                step += 1
                progressed = True
                pend.append((step, l_pi, l_v))
                while len(pend) > PIPE:
                    _drain_one()
            if not progressed:
                break  # empty iterable — avoid an infinite loop
        while pend:
            _drain_one()
        self.l_pi = pi_sum / max(count, 1)
        self.l_v = v_sum / max(count, 1)
        return self.l_pi, self.l_v

    # ------------------------------------------------------------ checkpoint
    def save_checkpoint(self, folder: str, filename: str) -> str:
        os.makedirs(folder, exist_ok=True)
        path = os.path.join(folder, filename)
        payload = serialization.to_bytes(self.state)
        with open(path + ".ckpt", "wb") as f:
            f.write(payload)
        from alphazero_general_tpu.utils.config import save_args_file

        save_args_file(self.args, path + ".json")
        return path + ".ckpt"

    def load_checkpoint(self, folder: str, filename: str) -> None:
        path = os.path.join(folder, filename)
        with open(path + ".ckpt", "rb") as f:
            data = f.read()
        self.state = serialization.from_bytes(self.state, data)
        if self.mesh is not None:
            from alphazero_general_tpu.parallel.mesh import replicate_tree

            self.state = replicate_tree(self.state, self.mesh)

    @classmethod
    def from_checkpoint(cls, env, folder: str, filename: str,
                        override_args: Args | None = None) -> "NNetWrapper":
        """Rebuild a wrapper from a saved checkpoint + its embedded args
        (NNetWrapper.py:252-282)."""
        from alphazero_general_tpu.utils.config import load_args_file

        path = os.path.join(folder, filename)
        args = load_args_file(path + ".json")
        if override_args:
            args.update(override_args)
        wrapper = cls(env, get_args(args))
        wrapper.load_checkpoint(folder, filename)
        return wrapper
