"""Jitted lockstep self-play.

TPU-native replacement for the reference's actor runtime (reference:
alphazero/SelfPlayAgent.pyx:13-203 + the Coach inference-server loop,
Coach.py:325-361): instead of worker processes exchanging shared-memory
tensors with a central GPU server, a single jitted program advances a batch of
B games one move per step — search (scan over simulations with the network
call fused in), temperature-scaled sampling, env step, auto-reset — and the
whole move loop is scanned on device. Sharding the batch axis over a mesh
makes the same program run on any slice.

Parity notes:
* fast/full simulation choice is batch-global per move round, exactly like a
  reference worker (SelfPlayAgent.pyx:84-86 — ``self.fast`` applies to the
  whole process batch);
* per-game temperature follows args.temp_scaling_fn semantics (utils.py:19-27)
  updated *before* sampling each move (SelfPlayAgent.pyx:156-158);
* samples store the observation before the move and the full-temperature
  policy (SelfPlayAgent.pyx:161-165); the final win vector is attached by a
  reverse pass at iteration end (replay.py) — the jit-friendly equivalent of
  pushing (obs, pi, winstate) at game end (SelfPlayAgent.pyx:176-196);
* fresh search tree per move. The reference reuses subtrees via update_root
  (MCTS.pyx:185-195) — re-rooting an array tree is planned (see ROADMAP);
  reference also offers periodic resets via mctsResetThreshold.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

import alphazero_general_tpu.mcts.search as S
import alphazero_general_tpu.mcts.tree as T

#: Action-space size at which move records ship the policy as exact top-k
#: values+ids instead of the dense [B, A] row (see MoveRecord.pi).
_SPARSE_PI_MIN_ACTIONS = 512


class SelfPlayConfig(NamedTuple):
    """Static self-play hyperparameters (hashable for jit)."""

    sims_full: int = 100  # numMCTSSims
    sims_fast: int = 20  # numFastSims
    sims_warmup: int = 5  # numWarmupSims
    prob_fast: float = 0.75  # probFastSim
    start_temp: float = 1.0  # startTemp
    temp_scale_factor: float = 0.15  # default_temp_scaling
    temp_min: float = 0.2
    const_temp: bool = False
    tree_capacity: int = 0  # 0 → sims_full + 2 (2x+2 with tree reuse)
    # Carry each game's search tree across moves, re-rooted at the played
    # action (reference: update_root tree reuse, MCTS.pyx:185-195). Opt-in
    # pending an Elo A/B (ROADMAP); the reference reuses by default.
    reuse_tree: bool = False
    # Leaves evaluated per network call (multi-leaf rounds, virtual-loss
    # style — departs from the reference's 1-leaf-per-step search, so it is
    # opt-in; see mcts/search._round_step_t). Requires the fresh-tree
    # game-minor kernel path; other paths silently run 1.
    leaf_batch: int = 1
    # With tree reuse: restart a game's tree from scratch once it holds more
    # than this many nodes (reference: mctsResetThreshold,
    # SelfPlayAgent.pyx:172-174). 0 = only the capacity-overflow restart.
    reset_threshold: int = 0
    # Which descent/backup implementation the searches use ('auto' picks the
    # Pallas kernels on TPU; 'pallas_interpret' forces interpret-mode kernels
    # — used by the multi-chip dryrun to exercise the kernel paths under a
    # CPU mesh, see __graft_entry__.dryrun_multichip).
    walk_impl: str = "auto"
    spec: T.SearchSpec = T.SearchSpec()

    @property
    def capacity(self) -> int:
        if self.tree_capacity:
            return self.tree_capacity
        base = max(self.sims_full, self.sims_warmup)
        # With reuse the carried subtree plus a full search must fit.
        return 2 * base + 2 if self.reuse_tree else base + 2

    @classmethod
    def from_args(cls, args, num_players: int, has_draw: bool,
                  warmup: bool = False) -> "SelfPlayConfig":
        spec = T.SearchSpec(
            cpuct=float(args.cpuct),
            fpu_reduction=float(args.fpu_reduction),
            root_policy_temp=float(args.root_policy_temp),
            root_noise_frac=float(args.root_noise_frac),
            min_discount=float(args.min_discount),
            add_root_noise=bool(args.add_root_noise),
            add_root_temp=bool(args.add_root_temp),
            num_players=num_players,
            has_draw=has_draw,
        )
        from alphazero_general_tpu.utils.misc import const_temp_scaling

        return cls(
            sims_full=int(args.numMCTSSims),
            sims_fast=int(args.numFastSims),
            sims_warmup=int(args.numWarmupSims),
            prob_fast=float(args.probFastSim),
            start_temp=float(args.startTemp),
            const_temp=args.get("temp_scaling_fn") is const_temp_scaling,
            tree_capacity=int(args.get("max_tree_nodes", 0)),
            reuse_tree=bool(args.get("reuse_tree", False)),
            leaf_batch=int(args.get("leaf_batch", 1)),
            reset_threshold=int(args.get("mctsResetThreshold") or 0),
            walk_impl=str(args.get("walk_impl", "auto")),
            spec=spec,
        )


@struct.dataclass
class SelfPlayState:
    """Device-resident carry for a batch of lockstep games.

    ``trees`` is only populated when the config enables tree reuse; it then
    holds each game's re-rooted search tree between moves (None otherwise —
    a fresh arena is built per move)."""

    env_state: object  # batched env pytree [B, ...]
    temps: jnp.ndarray  # f32[B]
    games_played: jnp.ndarray  # i32 scalar (completed games so far)
    move_count: jnp.ndarray  # i32 scalar (move rounds so far)
    trees: object = None  # batched Tree [B, ...] when reuse_tree


@struct.dataclass
class MoveRecord:
    """Per-move trajectory record emitted by each move step [B, ...]."""

    obs: jnp.ndarray  # f32[B, C, H, W] observation before the move
    pi: jnp.ndarray  # f32[B, A] full-temperature policy — OR, for large
    # action spaces, the top-k VALUES [B, K] with ``pi_idx`` set (the
    # visit-count policy has at most sims+1 nonzeros, so k = sims+1 is
    # EXACT, not an approximation; the host densifies before finalize).
    player: jnp.ndarray  # i32[B] player who moved
    action: jnp.ndarray  # i32[B]
    win_state: jnp.ndarray  # f32[B, V] result after the move (0s if running)
    done: jnp.ndarray  # bool[B] game ended on this move
    fast: jnp.ndarray  # bool[] batch-global fast-sim flag (sample discarded)
    pi_idx: jnp.ndarray = None  # i32[B, K] top-k action ids (sparse mode)


def init_selfplay(env, batch_size: int, start_temp: float = 1.0,
                  cfg: SelfPlayConfig | None = None) -> SelfPlayState:
    states = jax.vmap(lambda _: env.init())(jnp.arange(batch_size))
    trees = None
    if cfg is not None and cfg.reuse_tree:
        trees = S.init_batched_trees(env, states, cfg.capacity,
                                     cfg.spec.value_size)
    return SelfPlayState(
        env_state=states,
        temps=jnp.full((batch_size,), jnp.float32(start_temp)),
        games_played=jnp.int32(0),
        move_count=jnp.int32(0),
        trees=trees,
    )


def _update_temps(cfg: SelfPlayConfig, temps, turns, max_turns: int):
    """Jittable default_temp_scaling (utils.py:19-27)."""
    if cfg.const_temp:
        return temps
    period = max(int(cfg.temp_scale_factor * max_turns), 1)
    hit = (turns + 1) % period == 0
    return jnp.where(hit, jnp.maximum(cfg.temp_min, temps / 2.0), temps)


def move_step(env, cfg: SelfPlayConfig, eval_fn, carry: SelfPlayState,
              rng, warmup: bool = False, sims_override: int | None = None,
              fast_flag: bool = False):
    """One move for every game in the batch; returns (carry, MoveRecord).

    With ``sims_override`` set, the fast/full decision is made by the *caller*
    (host) and the program contains a single search of fixed length — much
    cheaper to compile than a traced two-branch cond; the batch-global
    fast-sim draw matches the reference worker either way
    (SelfPlayAgent.pyx:84-86).
    """
    B = carry.temps.shape[0]
    r_fast, r_search, r_action, _ = jax.random.split(rng, 4)
    states = carry.env_state

    if cfg.reuse_tree:
        trees = carry.trees  # carried, already rooted at `states`
    else:
        # Right-size the fresh arena to the sims this move actually runs:
        # fast moves (75% by default) otherwise pay every O(rows) walk pass
        # at full-search size (fast 40-sim searches on a 200-sim arena).
        cap = cfg.capacity
        if warmup:
            cap = min(cap, cfg.sims_warmup + 2)
        elif sims_override is not None:
            cap = min(cap, sims_override + 2)
        trees = S.init_batched_trees(env, states, cap, cfg.spec.value_size)

    if warmup:
        # Uniform policy/value, no network (SelfPlayAgent.pyx:48-52, 111-114).
        warm_eval = S.uniform_eval_fn(
            env.ACTION_SIZE, cfg.spec.value_size, uniform_value=True
        )
        trees = S.search(env, trees, cfg.spec, warm_eval, cfg.sims_warmup,
                         r_search, fresh_tree=not cfg.reuse_tree,
                         leaf_batch=cfg.leaf_batch, walk_impl=cfg.walk_impl)
        fast = jnp.bool_(False)
    elif sims_override is not None:
        trees = S.search(env, trees, cfg.spec, eval_fn, sims_override,
                         r_search, fresh_tree=not cfg.reuse_tree,
                         leaf_batch=cfg.leaf_batch, walk_impl=cfg.walk_impl)
        fast = jnp.bool_(fast_flag)
    else:
        fast = jax.random.uniform(r_fast) < cfg.prob_fast

        def do_fast(trees):
            return S.search(env, trees, cfg.spec, eval_fn, cfg.sims_fast,
                            r_search, fresh_tree=not cfg.reuse_tree,
                            leaf_batch=cfg.leaf_batch,
                            walk_impl=cfg.walk_impl)

        def do_full(trees):
            return S.search(env, trees, cfg.spec, eval_fn, cfg.sims_full,
                            r_search, fresh_tree=not cfg.reuse_tree,
                            leaf_batch=cfg.leaf_batch,
                            walk_impl=cfg.walk_impl)

        trees = jax.lax.cond(fast, do_fast, do_full, trees)

    # Temperature update before sampling (SelfPlayAgent.pyx:156-158).
    temps = _update_temps(cfg, carry.temps, states.turns, env.MAX_TURNS)

    pi_full = jax.vmap(lambda t: T.probs(t, 1.0))(trees)
    pi_temp = jax.vmap(T.probs)(trees, temps)

    logits = jnp.log(jnp.maximum(pi_temp, 1e-30))
    action = jax.random.categorical(r_action, logits, axis=-1).astype(jnp.int32)

    obs = jax.vmap(env.observation)(states)
    player = states.player

    new_states = jax.vmap(env.step)(states, action)
    win = jax.vmap(env.win_state)(new_states)
    done = jnp.any(win > 0, axis=-1)

    # Auto-reset finished slots (SelfPlayAgent.pyx:197-200).
    fresh = jax.vmap(lambda _: env.init())(jnp.arange(B))
    def _sel(n, f):
        d = done.reshape((B,) + (1,) * (n.ndim - 1))
        return jnp.where(d, f, n)
    next_states = jax.tree_util.tree_map(_sel, new_states, fresh)
    temps = jnp.where(done, cfg.start_temp, temps)

    next_trees = None
    if cfg.reuse_tree:
        # Re-root at the played action (update_root, MCTS.pyx:185-195);
        # finished or capacity-overflowing games restart from a fresh arena.
        rerooted = jax.vmap(lambda t, a: T.reroot(env, t, a))(trees, action)
        overflow = (
            rerooted.next_free + max(cfg.sims_full, cfg.sims_warmup) + 1
            > cfg.capacity
        )
        if cfg.reset_threshold > 0:
            # Periodic tree reset knob (mctsResetThreshold,
            # SelfPlayAgent.pyx:172-174) on top of the capacity fallback.
            overflow = overflow | (rerooted.next_free > cfg.reset_threshold)
        restart = done | overflow
        fresh_trees = S.init_batched_trees(
            env, next_states, cfg.capacity, cfg.spec.value_size
        )
        def _selt(a, b):
            d = restart.reshape((B,) + (1,) * (a.ndim - 1))
            return jnp.where(d, b, a)
        next_trees = jax.tree_util.tree_map(_selt, rerooted, fresh_trees)

    carry = SelfPlayState(
        env_state=next_states,
        temps=temps,
        games_played=carry.games_played + jnp.sum(done).astype(jnp.int32),
        move_count=carry.move_count + 1,
        trees=next_trees,
    )
    record = MoveRecord(
        obs=obs, pi=pi_full, player=player, action=action,
        win_state=win, done=done, fast=fast,
    )
    return carry, record


def play_chunk(env, cfg: SelfPlayConfig, eval_fn, carry: SelfPlayState,
               rng, num_moves: int, warmup: bool = False):
    """Scan ``num_moves`` move steps; returns (carry, records [K, B, ...])."""

    def body(carry, r):
        return move_step(env, cfg, eval_fn, carry, r, warmup=warmup)

    return jax.lax.scan(body, carry, jax.random.split(rng, num_moves))


def make_move_fns(env, cfg: SelfPlayConfig, apply_fn, mesh=None):
    """Production move runners: separately-jitted fast / full / warmup move
    steps with host-side fast-sim choice (see move_step docstring).

    Returns dict with 'fast', 'full', 'warmup' → jitted
    ``fn(variables, carry, rng) -> (carry, MoveRecord)``. Pass ``mesh`` to
    shard the game batch over devices (params replicated).

    Record slimming (host→device bandwidth is a production bottleneck at
    tafl scale — VERDICT.md weak#6): the 'fast' program returns obs/pi as
    None (fast-sim samples are discarded by finalize anyway,
    SelfPlayAgent.pyx:84-86), and sample payloads of the other programs are
    downcast to float16 on device (board planes are exactly representable;
    π entries round at ~0.05%).
    """

    def build(sims, fast_flag, warmup):
        def run(variables, carry, rng):
            def eval_fn(obs):
                logp, logv = apply_fn(variables, obs)
                return jnp.exp(logp), jnp.exp(logv)

            carry, rec = move_step(env, cfg, eval_fn, carry, rng,
                                   warmup=warmup,
                                   sims_override=None if warmup else sims,
                                   fast_flag=fast_flag)
            if fast_flag:
                rec = rec.replace(obs=None, pi=None)
            elif env.ACTION_SIZE >= _SPARSE_PI_MIN_ACTIONS:
                # Exact sparse π: ≤ sims+1 root children can have visits, so
                # the top-(sims+1) values+ids carry the full policy. Cuts
                # the per-round device→host record transfer ~(A / 2k)x —
                # at tafl/chess scale that transfer (not compute) bounds
                # the collection loop over this environment's TPU tunnel.
                k = min(env.ACTION_SIZE,
                        (cfg.sims_warmup if warmup else sims) + 1)
                vals, idx = jax.lax.top_k(rec.pi, k)
                rec = rec.replace(obs=rec.obs.astype(jnp.float16),
                                  pi=vals.astype(jnp.float16),
                                  pi_idx=idx.astype(jnp.int32))
            else:
                rec = rec.replace(obs=rec.obs.astype(jnp.float16),
                                  pi=rec.pi.astype(jnp.float16))
            return carry, rec

        if mesh is not None:
            from alphazero_general_tpu.parallel.mesh import replicated

            rep = replicated(mesh)
            return jax.jit(run, in_shardings=(rep, None, rep))
        return jax.jit(run)

    return {
        "fast": build(cfg.sims_fast, True, False),
        "full": build(cfg.sims_full, False, False),
        "warmup": build(cfg.sims_warmup, False, True),
    }


def make_play_chunk_fn(env, cfg: SelfPlayConfig, apply_fn, num_moves: int,
                       warmup: bool = False):
    """Build a jitted chunk runner bound to a model apply function.

    ``apply_fn(variables, obs) -> (log_pi, log_v)``; variables are a runtime
    argument so updated/gated parameters never trigger recompilation
    (the gating swap in Coach.py:558-572 becomes a pointer swap).
    """

    def run(variables, carry, rng):
        def eval_fn(obs):
            logp, logv = apply_fn(variables, obs)
            return jnp.exp(logp), jnp.exp(logv)

        return play_chunk(env, cfg, eval_fn, carry, rng, num_moves,
                          warmup=warmup)

    return jax.jit(run)
