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
        self._sym_env = None
        self._window_mode = False
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

    def set_device_symmetries(self, env) -> None:
        """Train on RAW (un-expanded) sample batches: each jitted train step
        applies one random symmetry per drawn sample ON DEVICE — batches
        become ``(obs, pi, value, sym_idx)``. Replaces the reference's 8x
        host-side dataset expansion (Coach.py:375-381 via symmetricSamples):
        the expanded window never exists anywhere, host RAM and feed
        bandwidth drop by the symmetry-group size, and the gathers ride the
        TPU. ``env=None`` restores the expanded-batch contract."""
        if env is not None and getattr(env, "NUM_SYMMETRIES", 1) <= 1:
            env = None
        if env is self._sym_env:
            return
        self._sym_env = env
        # The batch pytree structure changes (3-tuple <-> 4-tuple), so the
        # jitted step (and its mesh shardings) must be rebuilt.
        if self.mesh is not None:
            from alphazero_general_tpu.parallel.mesh import (
                make_sharded_train_step,
            )

            self._jit_train_step = make_sharded_train_step(self, self.mesh)
        else:
            self._jit_train_step = jax.jit(self._train_step)

    def set_device_window(self, enabled: bool) -> None:
        """Device-resident window mode (selfplay/device_window.py): train
        batches become ``(obs_buf, pi_buf, val_buf, idx[, sym_idx])`` — the
        whole window's device ring buffers plus per-step index vectors; the
        jitted step gathers its rows ON DEVICE, so the host ships ~KBs of
        indices per step instead of the minibatch itself. The buffers ride
        along as jit ARGUMENTS (never closure constants) so a new iteration's
        updated ring reuses the same compiled program."""
        enabled = bool(enabled)
        if enabled == self._window_mode:
            return
        self._window_mode = enabled
        # Batch pytree structure changes — rebuild the jitted step.
        if self.mesh is not None:
            from alphazero_general_tpu.parallel.mesh import (
                make_sharded_train_step,
            )

            self._jit_train_step = make_sharded_train_step(self, self.mesh)
        else:
            self._jit_train_step = jax.jit(self._train_step)

    def _prep_batch(self, batch):
        """Normalize a train batch inside the jitted step: cast to f32 on
        device (batches ship in the store's f16 — half the host→device
        bytes) and, when device symmetries are enabled, replace each row by
        its ``sym_idx``-th symmetric image via the env's own ``symmetries``
        (bit-identical to the host expansion path, tests/test_device_sym).
        Window mode (set_device_window) gathers the minibatch rows from the
        device-resident ring first — bit-identical to the host gather of the
        same f16 rows (tests/test_device_window.py)."""
        if self._window_mode:
            obs_buf, pi_buf, val_buf, idx = batch[:4]
            batch = (obs_buf[idx], pi_buf[idx], val_buf[idx]) + tuple(
                batch[4:])
        if self._sym_env is not None and len(batch) == 4:
            obs, pi, value, sym = batch
            obs = obs.astype(jnp.float32)
            pi = pi.astype(jnp.float32)
            o_s, p_s = jax.vmap(self._sym_env.symmetries)(obs, pi)
            b = jnp.arange(obs.shape[0])
            return (o_s[b, sym], p_s[b, sym], value.astype(jnp.float32))
        return tuple(x.astype(jnp.float32) for x in batch)

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
        # The unquantized head weights pass through quantize_resnet
        # untouched, so numpy param leaves (e.g. straight after a
        # checkpoint load) would stay numpy inside qp and be re-uploaded
        # by every jitted self-play/arena call. Commit the whole pytree.
        return jax.device_put(qp), quant_apply

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
        batch = self._prep_batch(batch)
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
                    tuple(jnp.asarray(x) for x in batch), self.mesh)
            # Ship the store's dtype (f16 halves host→device bytes); the
            # step casts to f32 on device before any CE/log math
            # (_prep_batch) — half precision never reaches the loss.
            return tuple(jnp.asarray(x) for x in batch)

        # Producer thread: host-side batch assembly (fancy-gather over the
        # window + device transfer enqueue) runs ahead of the step loop so
        # it overlaps device compute instead of serializing with it — the
        # replacement for the reference's DataLoader worker/pin_memory feed
        # (Coach.py:466-469).
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=4)
        stop = threading.Event()

        def _producer():
            # Re-iterables (lists, datasets) restart when exhausted so a
            # finite batch collection loops epochs until train_steps — the
            # pre-producer contract (callers like _train_on_past_data pass
            # short lists and expect step-capped epoch cycling). One-shot
            # iterators/generators end the loop at exhaustion.
            try:
                while not stop.is_set():
                    it = iter(batches)
                    one_shot = it is batches
                    produced = False
                    for batch in it:
                        if stop.is_set():
                            return
                        dev = _to_device(batch)
                        if dev is None:
                            continue
                        produced = True
                        while not stop.is_set():
                            try:
                                q.put(dev, timeout=0.2)
                                break
                            except queue.Full:
                                continue
                    if one_shot or not produced:
                        return
            finally:
                while not stop.is_set():
                    try:
                        q.put(None, timeout=0.2)  # end-of-data sentinel
                        break
                    except queue.Full:
                        continue

        producer = threading.Thread(target=_producer, daemon=True)
        producer.start()
        try:
            while step < train_steps:
                batch = q.get()
                if batch is None:
                    # One-shot iterator exhausted (or empty input) before
                    # train_steps — loud, not silent: callers sizing steps
                    # from sample counts should know they under-trained.
                    if step < train_steps:
                        print(f"Warning: batch source exhausted at step "
                              f"{step}/{train_steps}")
                    break
                self.state, (l_pi, l_v) = self._jit_train_step(
                    self.state, batch, lr
                )
                step += 1
                pend.append((step, l_pi, l_v))
                while len(pend) > PIPE:
                    _drain_one()
        finally:
            stop.set()
            # Drain until the producer actually exits: a single timed join
            # can orphan a daemon thread mid device-transfer that would then
            # keep iterating `batches` (and its shared numpy RNG) while a
            # later train() call runs its own producer.
            import time as _time

            deadline = _time.time() + 30.0
            while producer.is_alive() and _time.time() < deadline:
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                producer.join(timeout=0.2)
            if producer.is_alive():
                print("Warning: train batch producer did not exit; "
                      "subsequent train() calls may race it")
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
        else:
            # from_bytes restores NUMPY leaves. Left that way, every jitted
            # consumer re-uploads the full parameter set on every call —
            # measured 168 MB/move over the TPU tunnel in gated self-play
            # (the checkpoint-loaded self_play_net), ~3 s/move of transfer
            # and a client-side staging leak that oom-killed the host.
            self.state = jax.device_put(self.state)

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
