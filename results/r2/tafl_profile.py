"""Hnefatafl perf breakdown on the real chip (VERDICT round-1 item 4).

Times, at the bench shape (B=512, 100 sims, uniform eval):
  - full raw search with the 'scan' (prefix-sum) vs 'dense' (mask-matmul)
    movegen;
  - env.step alone (capture + flood-fill encirclement);
  - win_and_valids alone (movegen + win checks), per impl;
  - tree-only cost (search over connect4-sized... no — estimated as
    search_total - env components is unreliable; instead we time search with
    a stub env of the same action size whose step/win/valids are trivial).

Measurement rules (ROADMAP): chain iteration-dependent inputs (the axon
tunnel memoizes identical executions), block once per timed chain.
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from alphazero_general_tpu.envs.tafl import (
    HNEFATAFL_BOARD, Hnefatafl, make_tafl_env,
)
from alphazero_general_tpu.mcts.search import (
    init_batched_trees, search, uniform_eval_fn,
)
from alphazero_general_tpu.mcts.tree import SearchSpec

B, SIMS, K = 512, 100, 20
HnefataflDense = make_tafl_env(
    "hnefatafl_dense", HNEFATAFL_BOARD, king_two_sided_capture=True,
    draw_move_count=512, movegen="dense")


def timed(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))  # compile
    best = float("inf")
    for r in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
        args = (args[0], jax.random.fold_in(args[1], r)) if len(args) > 1 else args
    return best, out


def rollout_states(env, key):
    """B boards advanced by ~12 random legal moves (varied positions)."""
    def mv(state, k):
        v = env.valid_moves(state)
        a = jax.random.categorical(k, jnp.where(v, 0.0, -jnp.inf))
        return env.step(state, a), None

    def one(k):
        s = env.init()
        s, _ = jax.lax.scan(mv, s, jax.random.split(k, 12))
        return s
    return jax.vmap(one)(jax.random.split(key, B))


def search_time(env, states, key):
    spec = SearchSpec(num_players=2, has_draw=True)
    ev = uniform_eval_fn(env.ACTION_SIZE, 3)

    @jax.jit
    def run(states, rng):
        trees = init_batched_trees(env, states, SIMS + 2, 3)
        return search(env, trees, spec, ev, SIMS, rng)
    return timed(run, states, key)[0]


def step_time(env, states, key):
    @jax.jit
    def run(states, rng):
        def body(s, k):
            kk = jax.vmap(jax.random.fold_in)(jax.random.split(k, B),
                                              jnp.arange(B))
            def one(st, kx):
                v = env.valid_moves(st)
                a = jax.random.categorical(kx, jnp.where(v, 0.0, -jnp.inf))
                return env.step(st, a)
            return jax.vmap(one)(s, kk), None
        s, _ = jax.lax.scan(body, states, jax.random.split(rng, K))
        return s
    return timed(run, states, key)[0] / K


def wv_time(env, states, key):
    @jax.jit
    def run(states, rng):
        def body(carry, k):
            s, acc = carry
            w, v = jax.vmap(env.win_and_valids)(s)
            return (s, acc + w.sum() + v.sum()), None
        (s, acc), _ = jax.lax.scan(body, (states, 0.0), jnp.arange(K))
        return acc
    return timed(run, states, key)[0] / K


def main():
    key = jax.random.PRNGKey(0)
    for name, env in (("scan", Hnefatafl), ("dense", HnefataflDense)):
        states = rollout_states(env, key)
        ts = search_time(env, states, jax.random.PRNGKey(1))
        tstep = step_time(env, states, jax.random.PRNGKey(2))
        twv = wv_time(env, states, jax.random.PRNGKey(3))
        sims_s = B * SIMS / ts
        print(f"[{name:5s}] search {ts*1e3:7.1f} ms ({sims_s/1e3:6.1f}k sims/s)"
              f"  step {tstep*1e3:6.2f} ms/round  win+valids {twv*1e3:6.2f} ms/round")
        # per-sim budget: search does ~1 step + 1 win_and_valids per sim
        print(f"        per-sim round {ts/SIMS*1e3:6.3f} ms: "
              f"step {tstep*1e3:6.3f} + wv {twv*1e3:6.3f} + tree/walk "
              f"{(ts/SIMS - tstep - twv)*1e3:6.3f}")


if __name__ == "__main__":
    main()
