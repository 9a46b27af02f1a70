"""Batched N-model arena — jitted model comparison.

Replaces the reference Arena (reference: alphazero/Arena.pyx:58-376): instead
of re-using the multiprocess self-play agents with per-player batch queues
(the path flagged in-code as ~10x slower than self-play, Arena.pyx:209), all
models are resident on device and every move round evaluates the whole game
batch under jit. As in the reference batched arena, the model of the player to
move at the *root* evaluates that game's entire search for the move
(SelfPlayAgent.pyx:117-121), no root noise / no root temperature is applied
(SelfPlayAgent.pyx:148-151), and the move temperature is args.arenaTemp
(SelfPlayAgent.pyx:156-158).

Seat assignment and per-model routing (the TPU version of the reference's
per-player batch queues, Arena.pyx:264-281): the batch is split into
NUM_PLAYERS contiguous seat-rotation groups — in group k, model m plays
player (m + k) % N — so every model sees every seat equally (the vectorized
equivalent of the per-worker seat shuffle, SelfPlayAgent.pyx:44-47 /
sequential alternation, Arena.pyx:332-337). Because every env in the registry
advances ``player = (player + 1) % N`` on each step (envs/core.py
``next_player``), the player to move in every *running* game at move round t
is ``t % N``, i.e. the model owning each group is batch-uniform per round.
Each model therefore evaluates exactly one group (B/N observations) per sim
step — total network work is one model-forward per game per sim step,
matching self-play cost, instead of evaluating every model on every game
(finished games stay frozen and are evaluated by whichever model owns their
group; their searches are discarded). Envs that ever skip a player's turn
must set ``ALTERNATES = False`` to force the evaluate-all fallback.

N-player support matches the reference's players-list arena (Arena.pyx:58-76,
README.md:16): pass one (apply_fn, variables) per player seat.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import struct

import alphazero_general_tpu.mcts.search as S
import alphazero_general_tpu.mcts.tree as T


class ArenaConfig(NamedTuple):
    sims: int = 100  # numMCTSSims (arena uses full sims; arenaMCTS=True)
    arena_temp: float = 0.25  # arenaTemp
    tree_capacity: int = 0
    walk_impl: str = "auto"  # see SelfPlayConfig.walk_impl
    # Owner routing: each model forwards ONLY the games whose seat it owns
    # this turn (one group per model, arena.py eval_grouped) — the fix for
    # the reference's known ~10x batched-arena cost (Arena.pyx:209). False
    # falls back to every-model-evaluates-everything + select (bench A/B).
    route_owner: bool = True
    # Host-stepped driver (one jitted program per move round) instead of
    # search fused into lax.while_loop. Bit-identical games; required at
    # large sims x tower scale where the fused whole-game program crashes
    # the TPU worker (args.arenaHostLoop).
    host_loop: bool = False
    spec: T.SearchSpec = T.SearchSpec(add_root_noise=False, add_root_temp=False)

    @property
    def capacity(self) -> int:
        return self.tree_capacity or self.sims + 2

    @classmethod
    def from_args(cls, args, num_players: int, has_draw: bool) -> "ArenaConfig":
        spec = T.SearchSpec(
            cpuct=float(args.cpuct),
            fpu_reduction=float(args.fpu_reduction),
            min_discount=float(args.min_discount),
            add_root_noise=False,
            add_root_temp=False,
            num_players=num_players,
            has_draw=has_draw,
        )
        return cls(
            sims=int(args.numMCTSSims),
            arena_temp=float(args.arenaTemp),
            tree_capacity=int(args.get("max_tree_nodes", 0)),
            walk_impl=str(args.get("walk_impl", "auto")),
            host_loop=bool(args.get("arenaHostLoop", False)),
            spec=spec,
        )


#: Jitted per-move programs for the host-stepped driver, keyed on everything
#: their trace closes over — reused across play_games_multi calls so repeated
#: arena invocations don't retrace (values hold strong refs to the id()-keyed
#: objects so ids can't be recycled into stale-trace aliases).
_HOST_MOVE_JITS: dict = {}


@struct.dataclass
class ArenaResult:
    """Per-game outcome, seat-remapped to model indices."""

    model_wins: jnp.ndarray  # f32[M]
    draws: jnp.ndarray  # f32
    avg_game_length: jnp.ndarray  # f32
    num_games: jnp.ndarray  # i32


def play_games_multi(env, cfg: ArenaConfig, apply_fns: Sequence,
                     variables_list: Sequence, num_games: int, rng,
                     shard=None):
    """Play ``num_games`` games between ``N = env.NUM_PLAYERS`` models;
    returns ArenaResult with ``model_wins[m]`` = wins of ``apply_fns[m]``.

    ``num_games`` must be divisible by N (each seat-rotation group holds
    B/N games). Jittable end-to-end; wrap via :func:`make_multi_arena_fn`.
    ``shard`` (optional NamedSharding) constrains per-game arrays so the game
    batch shards over a device mesh.
    """
    N = env.NUM_PLAYERS
    if len(apply_fns) != N:
        raise ValueError(f"need {N} (apply_fn, variables) pairs, "
                         f"got {len(apply_fns)}")
    B = num_games
    if B % N:
        raise ValueError(f"num_games={B} must be divisible by NUM_PLAYERS={N}")
    G = B // N
    A = env.ACTION_SIZE
    value_size = cfg.spec.value_size
    alternates = bool(getattr(env, "ALTERNATES", True))

    def constrain(tree):
        # with_sharding_constraint is only valid under jit; the host-loop
        # driver runs carry construction eagerly and applies its shardings
        # via explicit device_put + the move program's in_shardings instead.
        if shard is None or cfg.host_loop:
            return tree
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, shard)
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == B else x,
            tree,
        )

    states = constrain(jax.vmap(lambda _: env.init())(jnp.arange(B)))

    def eval_grouped(vlist, obs, t):
        """One model-forward per group: model m evaluates group (t - m) % N
        (the group whose running games have player m+k ≡ t to move)."""
        og = obs.reshape((N, G) + obs.shape[1:])
        pi = jnp.zeros((N, G, A), jnp.float32)
        v = jnp.zeros((N, G, value_size), jnp.float32)
        for m in range(N):
            gm = (t - m) % N
            obs_m = jax.lax.dynamic_index_in_dim(og, gm, 0, keepdims=False)
            pm, vm = apply_fns[m](vlist[m], obs_m)
            pi = jax.lax.dynamic_update_index_in_dim(
                pi, jnp.exp(pm).astype(jnp.float32), gm, 0)
            v = jax.lax.dynamic_update_index_in_dim(
                v, jnp.exp(vm).astype(jnp.float32), gm, 0)
        return pi.reshape(B, A), v.reshape(B, value_size)

    def eval_all(vlist, obs, model_idx):
        """Fallback for non-alternating envs: every model evaluates the whole
        batch, per-game select (the pre-rework path)."""
        pi = jnp.zeros((B, A), jnp.float32)
        v = jnp.zeros((B, value_size), jnp.float32)
        for m in range(N):
            pm, vm = apply_fns[m](vlist[m], obs)
            sel = (model_idx == m)[:, None]
            pi = jnp.where(sel, jnp.exp(pm).astype(jnp.float32), pi)
            v = jnp.where(sel, jnp.exp(vm).astype(jnp.float32), v)
        return pi, v

    # group index of every game (games are laid out group-contiguously)
    group = jnp.repeat(jnp.arange(N), G)

    def move(vlist, carry, t, r_search, r_action):
        """One arena move round for the whole batch (shared by the fused
        while_loop driver and the host-stepped driver below)."""
        states, done, result, length = carry

        if alternates and cfg.route_owner:
            eval_fn = lambda obs: eval_grouped(vlist, obs, t)  # noqa: E731
        else:
            # model of game g = model m with (m + group[g]) % N == player[g]
            model_idx = (states.player - group) % N
            eval_fn = lambda obs: eval_all(vlist, obs, model_idx)  # noqa: E731

        trees = constrain(
            S.init_batched_trees(env, states, cfg.capacity, value_size))
        trees = S.search(env, trees, cfg.spec, eval_fn, cfg.sims, r_search,
                         walk_impl=cfg.walk_impl)
        pi = jax.vmap(lambda tr: T.probs(tr, cfg.arena_temp))(trees)
        action = jax.random.categorical(
            r_action, jnp.log(jnp.maximum(pi, 1e-30)), axis=-1
        ).astype(jnp.int32)

        stepped = jax.vmap(env.step)(states, action)
        def _sel(new, old):
            d = done.reshape((B,) + (1,) * (new.ndim - 1))
            return jnp.where(d, old, new)
        new_states = jax.tree_util.tree_map(_sel, stepped, states)

        win = jax.vmap(env.win_state)(new_states)
        now_done = jnp.any(win > 0, axis=-1) & ~done
        result = jnp.where(now_done[:, None], win, result)
        length = jnp.where(now_done, t + 1, length)
        done = done | now_done
        return new_states, done, result, length

    carry0 = (
        states,
        constrain(jnp.zeros((B,), jnp.bool_)),
        constrain(jnp.zeros((B, value_size), jnp.float32)),
        constrain(jnp.zeros((B,), jnp.int32)),
    )

    if cfg.host_loop:
        # Host-stepped driver: one jitted program per move round instead of
        # search fused into lax.while_loop — the fused whole-game program
        # crashes the TPU worker at large sims x tower scale (observed at
        # 250 sims x 128ch x 10 on hnefatafl; the identical move as a
        # standalone program runs fine — see
        # results/r5/fused_arena_crash_repro.py). RNG threading mirrors the
        # fused driver exactly (same split sequence from the same key), so
        # both drivers play bit-identical games
        # (tests/test_arena_hostloop.py). Model parameters are an ARGUMENT
        # of the per-move program, not a closure constant: closed-over
        # weights get baked into the serialized HLO and a two-model
        # 128ch x 10 arena move exceeded the remote-compile request size
        # limit (HTTP 413). The jitted move is CACHED across
        # play_games_multi calls (keyed on everything the trace closes
        # over), so repeated arena invocations — every Coach iteration runs
        # two — reuse one traced program instead of retracing per call.
        key = (id(env), cfg, tuple(id(f) for f in apply_fns), B,
               None if shard is None else shard)
        cached = _HOST_MOVE_JITS.get(key)
        if cached is None:
            if shard is None:
                move_jit = jax.jit(move)
            else:
                # Mesh path: same explicit shardings the fused driver's
                # jitted run enforced — params replicated, per-game carry
                # arrays sharded on the game axis.
                rep = jax.sharding.NamedSharding(
                    shard.mesh, jax.sharding.PartitionSpec())

                def _sh(x):
                    if getattr(x, "ndim", 0) >= 1 and x.shape[0] == B:
                        return shard
                    return rep

                carry_sh = jax.tree_util.tree_map(_sh, carry0)
                vars_sh = jax.tree_util.tree_map(
                    lambda _: rep, list(variables_list))
                move_jit = jax.jit(
                    move, in_shardings=(vars_sh, carry_sh, None, None, None))
            # Hold strong refs to the id()-keyed objects so a dead id can
            # never alias a new env/apply_fn to a stale trace.
            _HOST_MOVE_JITS[key] = (move_jit, env, tuple(apply_fns))
        else:
            move_jit = cached[0]
        carry = carry0
        if shard is not None:
            from alphazero_general_tpu.parallel.mesh import replicate_tree

            carry = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, shard)
                if getattr(x, "ndim", 0) >= 1 and x.shape[0] == B
                else x, carry0)
            variables_list = replicate_tree(list(variables_list), shard.mesh)
        t = 0
        while t < int(env.MAX_TURNS):
            rng, r_search, r_action = jax.random.split(rng, 3)
            carry = move_jit(variables_list, carry, jnp.int32(t),
                             r_search, r_action)
            t += 1
            # Early-exit sync every few moves (each check is a device
            # round-trip; done games step as frozen no-ops in between).
            if t % 4 == 0 and bool(jnp.all(carry[1])):
                break
        states, done, result, length = carry
    else:
        def cond(carry):
            states, done, result, length, t, rng = carry
            return (~jnp.all(done)) & (t < env.MAX_TURNS)

        def body(carry):
            states, done, result, length, t, rng = carry
            rng, r_search, r_action = jax.random.split(rng, 3)
            new_states, done, result, length = move(
                variables_list, (states, done, result, length), t,
                r_search, r_action)
            return new_states, done, result, length, t + 1, rng

        init = carry0 + (jnp.int32(0), rng)
        states, done, result, length, t, rng = jax.lax.while_loop(
            cond, body, init)

    # Seat remap: model m of group k played player (m + k) % N
    # (reference: player_to_index remap, Arena.pyx:291-299, utils.py:34-54).
    grouped = result.reshape(N, G, value_size)  # [group, game, value]
    model_wins = []
    for m in range(N):
        w = 0.0
        for k in range(N):
            w = w + jnp.sum(grouped[k, :, (m + k) % N])
        model_wins.append(w)
    draws = (jnp.sum(result[:, N]) if value_size > N
             else jnp.zeros((), jnp.float32))
    return ArenaResult(
        model_wins=jnp.stack(model_wins),
        draws=draws,
        avg_game_length=jnp.mean(length.astype(jnp.float32)),
        num_games=jnp.int32(B),
    )


def play_games(env, cfg: ArenaConfig, apply_fn, variables_a, variables_b,
               num_games: int, rng, apply_fn_b=None, shard=None):
    """Two-model wrapper over :func:`play_games_multi` (the common case:
    gating/baseline arenas, Coach.py:527-590). ``apply_fn_b`` lets model B use
    a different apply function (e.g. the model-free RawMCTS baseline,
    GenericPlayers.py:198-200)."""
    apply_b = apply_fn_b or apply_fn
    return play_games_multi(
        env, cfg, [apply_fn, apply_b], [variables_a, variables_b],
        num_games, rng, shard=shard,
    )


def make_arena_fn(env, cfg: ArenaConfig, apply_fn, num_games: int,
                  apply_fn_b=None, mesh=None):
    """Jitted two-model arena; params are runtime args."""

    shard = None
    rep = None
    if mesh is not None:
        from alphazero_general_tpu.parallel.mesh import batch_sharding, replicated

        shard = batch_sharding(mesh)
        rep = replicated(mesh)

    def run(variables_a, variables_b, rng):
        return play_games(env, cfg, apply_fn, variables_a, variables_b,
                          num_games, rng, apply_fn_b=apply_fn_b, shard=shard)

    if cfg.host_loop:
        return run  # inner move programs are jitted; the driver is host code
    if mesh is not None:
        return jax.jit(run, in_shardings=(rep, rep, None))
    return jax.jit(run)


def make_multi_arena_fn(env, cfg: ArenaConfig, apply_fns: Sequence,
                        num_games: int, mesh=None):
    """Jitted N-model arena (reference: Arena players list, Arena.pyx:58-76);
    returns ``run(variables_list, rng) -> ArenaResult``."""

    shard = None
    rep = None
    if mesh is not None:
        from alphazero_general_tpu.parallel.mesh import batch_sharding, replicated

        shard = batch_sharding(mesh)
        rep = replicated(mesh)

    def run(variables_list, rng):
        return play_games_multi(env, cfg, apply_fns, variables_list,
                                num_games, rng, shard=shard)

    if cfg.host_loop:
        return run  # inner move programs are jitted; the driver is host code
    if mesh is not None:
        return jax.jit(run, in_shardings=([rep] * len(apply_fns), None))
    return jax.jit(run)


def raw_mcts_apply(action_size: int, value_size: int):
    """Apply fn of the RawMCTS baseline: uniform priors, (near-)zero values
    (reference: GenericPlayers.py:198-200 — raw_search semantics)."""

    def apply(variables, obs):
        B = obs.shape[0]
        logp = jnp.full((B, action_size), -jnp.log(float(action_size)))
        logv = jnp.full((B, value_size), -100.0)
        return logp, logv

    return apply


def winrates(result: ArenaResult, use_draws: bool = True):
    """Per-model winrate with half-credit draws
    (reference: Arena.pyx:19-36 _PlayerStats, Coach.py:393-396)."""
    n = jnp.maximum(result.num_games.astype(jnp.float32), 1.0)
    draw_credit = 0.5 * result.draws if use_draws else 0.0
    return (result.model_wins + draw_credit) / n
