"""Micro-decomposition of the hnefatafl sim round on the real chip.

Isolates, at B=512 (the bench raw-search shape):
  - movegen: vmapped `_ok_pair` alone (dense mask-matmul default)
  - step(fixed actions): captures incl. the two flood-fill fixpoints,
    with actions precomputed so no movegen/sampling pollutes the timing
  - win_and_valids (movegen + win checks)
  - observation
Each timed as a K-iteration on-device scan (chained state so the tunnel
cannot memoize), blocked once.
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from alphazero_general_tpu.envs.tafl import Hnefatafl as Env

B, K = 512, 50


def timed(make_run, states, reps=3):
    run = jax.jit(make_run)
    out = jax.block_until_ready(run(states, jax.random.PRNGKey(9)))
    best = float("inf")
    for r in range(reps):
        t0 = time.time()
        jax.block_until_ready(run(states, jax.random.fold_in(
            jax.random.PRNGKey(9), r)))
        best = min(best, time.time() - t0)
    return best / K


def rollout_states(key):
    def mv(state, k):
        v = Env.valid_moves(state)
        a = jax.random.categorical(k, jnp.where(v, 0.0, -jnp.inf))
        return Env.step(state, a), None

    def one(k):
        s = Env.init()
        s, _ = jax.lax.scan(mv, s, jax.random.split(k, 12))
        return s
    return jax.vmap(one)(jax.random.split(key, B))


def pick_actions(states, key):
    def one(st, k):
        v = Env.valid_moves(st)
        return jax.random.categorical(k, jnp.where(v, 0.0, -jnp.inf))
    return jax.vmap(one)(states, jax.random.split(key, B))


def main():
    states = rollout_states(jax.random.PRNGKey(0))
    actions = jax.block_until_ready(pick_actions(states, jax.random.PRNGKey(1)))

    def chain(states, f):
        # fold f's result back into the state's turns so iterations depend
        # on each other (no cross-iteration CSE / tunnel memoization)
        def body(s, _):
            acc = f(s)
            s = s.replace(turns=s.turns + (acc > -1).astype(jnp.int32) * 0)
            return s, None
        return body

    def t_step(states, rng):
        def body(s, _):
            s2 = jax.vmap(Env.step)(s, actions)
            # keep board from s2 but reset turns/player so actions stay legalish
            s = s.replace(turns=s.turns + 0 * s2.turns)
            return s2.replace(turns=s.turns, player=s.player,
                              king_captured=s.king_captured), None
        s, _ = jax.lax.scan(body, states, jnp.arange(K))
        return s

    def t_wv(states, rng):
        def body(carry, _):
            s, acc = carry
            w, v = jax.vmap(Env.win_and_valids)(s)
            acc = acc + w.sum() + v.sum()
            s = s.replace(turns=s.turns + (acc > -1).astype(jnp.int32) * 0)
            return (s, acc), None
        (s, acc), _ = jax.lax.scan(body, (states, jnp.float32(0)),
                                   jnp.arange(K))
        return acc

    def t_valids(states, rng):
        def body(carry, _):
            s, acc = carry
            v = jax.vmap(Env.valid_moves)(s)
            acc = acc + v.sum()
            s = s.replace(turns=s.turns + (acc > -1).astype(jnp.int32) * 0)
            return (s, acc), None
        (s, acc), _ = jax.lax.scan(body, (states, jnp.float32(0)),
                                   jnp.arange(K))
        return acc

    def t_obs(states, rng):
        def body(carry, _):
            s, acc = carry
            o = jax.vmap(Env.observation)(s)
            acc = acc + o.sum()
            s = s.replace(turns=s.turns + (acc > -1).astype(jnp.int32) * 0)
            return (s, acc), None
        (s, acc), _ = jax.lax.scan(body, (states, jnp.float32(0)),
                                   jnp.arange(K))
        return acc

    for name, fn in (("step(fixed actions)", t_step),
                     ("win_and_valids", t_wv),
                     ("valid_moves only", t_valids),
                     ("observation", t_obs)):
        ms = timed(fn, states) * 1e3
        print(f"{name:22s} {ms:7.3f} ms / round (B={B})")


if __name__ == "__main__":
    main()
