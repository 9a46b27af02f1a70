"""Batched search drivers over the array tree.

The reference routes leaf observations from worker processes to a central GPU
inference server through shared-memory tensors (reference:
alphazero/SelfPlayAgent.pyx:103-151, Coach.py:325-344). Here a "simulation
round" is one fused program: vmapped find_leaf → one batched network call →
vmapped process_results, scanned ``sims`` times under jit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from alphazero_general_tpu.mcts import tree as T

# An EvalFn maps a batch of observations [B, C, H, W] to
# (policy [B, A], value [B, value_size]); both are *probabilities*, matching
# the reference's NNetWrapper.process which exponentiates log-softmax outputs
# (NNetWrapper.py:225-232).
EvalFn = Callable[[jnp.ndarray], tuple]


def init_batched_trees(env, states, capacity: int, value_size: int):
    """states: batched env-state pytree [B, ...] → batched Tree [B, ...]."""
    return jax.vmap(lambda s: T.init_tree(env, s, capacity, value_size))(states)


def simulate_step(env, trees, spec: T.SearchSpec, eval_fn: EvalFn,
                  rng: jnp.ndarray, add_root_noise=None, add_root_temp=None,
                  root_adjust: bool = True):
    """One simulation round for every game in the batch."""
    B = trees.n.shape[0]
    rng_find, rng_noise = jax.random.split(rng)
    trees = jax.vmap(
        lambda t, r: T.find_leaf(env, t, spec, r)
    )(trees, jax.random.split(rng_find, B))

    obs = jax.vmap(lambda t: T.leaf_observation(env, t))(trees)
    pi, value = eval_fn(obs)

    trees = jax.vmap(
        lambda t, v, p, r: T.process_results(
            t, v, p, spec, r, add_root_noise, add_root_temp,
            root_adjust=root_adjust,
        )
    )(trees, value, pi, jax.random.split(rng_noise, B))
    return trees


def search(env, trees, spec: T.SearchSpec, eval_fn: EvalFn, sims: int,
           rng: jnp.ndarray, add_root_noise=None, add_root_temp=None):
    """Run ``sims`` simulation rounds (reference: MCTS.pyx:165-173).

    ``sims`` must be static (scan length). With a fresh tree per move the
    root can only be the leaf on the first simulation, so only that one
    carries the root-noise/temperature trace (MCTS.pyx:247-256).
    """
    rng_first, rng_rest = jax.random.split(rng)
    trees = simulate_step(
        env, trees, spec, eval_fn, rng_first, add_root_noise, add_root_temp,
        root_adjust=True,
    )
    if sims <= 1:
        return trees

    def body(trees, r):
        trees = simulate_step(
            env, trees, spec, eval_fn, r, add_root_noise, add_root_temp,
            root_adjust=False,
        )
        return trees, None

    trees, _ = jax.lax.scan(body, trees, jax.random.split(rng_rest, sims - 1))
    return trees


def uniform_eval_fn(action_size: int, value_size: int,
                    uniform_value: bool = False) -> EvalFn:
    """Model-free evaluation.

    ``uniform_value=False`` → zero values, matching raw_search
    (MCTS.pyx:175-183); ``True`` → uniform value 1/value_size, matching the
    warmup agent (SelfPlayAgent.pyx:48-52).
    """

    def eval_fn(obs):
        B = obs.shape[0]
        pi = jnp.full((B, action_size), 1.0, jnp.float32)
        fill = 1.0 / value_size if uniform_value else 0.0
        value = jnp.full((B, value_size), fill, jnp.float32)
        return pi, value

    return eval_fn


def raw_search(env, states, spec: T.SearchSpec, sims: int, rng: jnp.ndarray,
               capacity: Optional[int] = None, add_root_noise=None,
               add_root_temp=None):
    """Model-free batched search from scratch (MCTS.pyx:175-183)."""
    capacity = capacity or sims + 2
    trees = init_batched_trees(env, states, capacity, spec.value_size)
    eval_fn = uniform_eval_fn(env.ACTION_SIZE, spec.value_size)
    return search(env, trees, spec, eval_fn, sims, rng,
                  add_root_noise, add_root_temp)
