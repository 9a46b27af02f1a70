"""Player abstractions for interactive play, pit scripts, and arenas.

Parity with the reference player layer (reference:
alphazero/GenericPlayers.py:12-200). Players operate on single (unbatched)
env states — the sequential surface used by pit/GUI/round-robin; large-scale
evaluation uses the jitted batched arena instead (selfplay/arena.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import alphazero_general_tpu.mcts.search as S
import alphazero_general_tpu.mcts.tree as T


class BasePlayer:
    """Contract (GenericPlayers.py:12-44)."""

    def __init__(self, game_cls=None, args=None, verbose: bool = False):
        self.game_cls = game_cls
        self.args = args
        self.verbose = verbose

    def __call__(self, state) -> int:
        return self.play(state)

    @staticmethod
    def supports_process() -> bool:
        return False

    @staticmethod
    def requires_model() -> bool:
        return False

    @staticmethod
    def is_human() -> bool:
        return False

    def play(self, state) -> int:
        raise NotImplementedError

    def update(self, state, action: int) -> None:
        """Observe a move by any player (tree reuse hook)."""

    def reset(self) -> None:
        pass


class RandomPlayer(BasePlayer):
    """Uniform random over valid moves (GenericPlayers.py:47-52)."""

    def __init__(self, game_cls=None, args=None, seed: int = 0, **kw):
        super().__init__(game_cls, args, **kw)
        self._rng = np.random.default_rng(seed)

    def play(self, state) -> int:
        valids = np.asarray(self.game_cls.valid_moves(state))
        choices = np.flatnonzero(valids)
        return int(self._rng.choice(choices))


class NNPlayer(BasePlayer):
    """Raw policy sampling with temperature (GenericPlayers.py:55-97)."""

    def __init__(self, nn, game_cls=None, args=None, temp: Optional[float] = None,
                 seed: int = 0, **kw):
        super().__init__(game_cls or nn.env, args or nn.args, **kw)
        self.nn = nn
        self.temp = temp if temp is not None else float(self.args.startTemp)
        self._rng = np.random.default_rng(seed)

    @staticmethod
    def supports_process() -> bool:
        return True

    @staticmethod
    def requires_model() -> bool:
        return True

    def play(self, state) -> int:
        obs = self.game_cls.observation(state)
        pi, _ = self.nn.predict(obs)
        valids = np.asarray(self.game_cls.valid_moves(state))
        pi = pi * valids
        pi = pi / pi.sum()
        if self.temp <= 1e-6:
            return int(np.argmax(pi))
        p = pi ** (1.0 / self.temp)
        p /= p.sum()
        return int(self._rng.choice(len(p), p=p))

    def process(self, obs_batch):
        return self.nn.process(obs_batch)


class MCTSPlayer(BasePlayer):
    """Full search per move (GenericPlayers.py:100-163).

    Fresh tree per move; `update` currently a no-op (the reference reuses
    subtrees via update_root — see ROADMAP).
    """

    def __init__(self, nn, game_cls=None, args=None, seed: int = 0,
                 verbose: bool = False, average_value: bool = False, **kw):
        super().__init__(game_cls or (nn.env if nn else None),
                         args or (nn.args if nn else None), verbose=verbose)
        self.nn = nn
        self.average_value = average_value
        self.temp = float(self.args.startTemp)
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        num_players = self.game_cls.NUM_PLAYERS
        self.spec = T.SearchSpec(
            cpuct=float(self.args.cpuct),
            fpu_reduction=float(self.args.fpu_reduction),
            root_policy_temp=float(self.args.root_policy_temp),
            root_noise_frac=float(self.args.root_noise_frac),
            min_discount=float(self.args.min_discount),
            add_root_noise=bool(self.args.add_root_noise),
            add_root_temp=bool(self.args.add_root_temp),
            num_players=num_players,
            has_draw=self.game_cls.HAS_DRAW,
        )
        self.last_value = None
        self.last_depth = 0

        # Pre-jitted search pieces with stable identities — rebuilding these
        # lambdas per call would retrace/recompile on every simulation.
        env = self.game_cls
        spec = self.spec

        @jax.jit
        def _find(trees, keys):
            return jax.vmap(lambda t, r: T.find_leaf(env, t, spec, r))(
                trees, keys
            )

        @jax.jit
        def _observe(trees):
            return jax.vmap(lambda t: T.leaf_observation(env, t))(trees)

        @jax.jit
        def _process(trees, value, pi, keys):
            return jax.vmap(
                lambda t, vv, pp, r: T.process_results(t, vv, pp, spec, r)
            )(trees, value, pi, keys)

        @jax.jit
        def _stats(trees, temp):
            return (
                jax.vmap(T.probs)(trees, temp),
                jax.vmap(lambda t: T.root_value(t, self.average_value))(trees),
            )

        self._find, self._observe = _find, _observe
        self._process_trees, self._stats = _process, _stats

    @staticmethod
    def supports_process() -> bool:
        return True

    @staticmethod
    def requires_model() -> bool:
        return True

    def _eval_fn(self):
        nn = self.nn

        def eval_fn(obs):
            return nn.process(obs)

        return eval_fn

    def _run_search(self, state, sims: int):
        env = self.game_cls
        states = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], state)
        trees = S.init_batched_trees(env, states, sims + 2,
                                     self.spec.value_size)
        # Host-loop simulation rounds: NN round-trip per sim like the
        # reference's unbatched MCTSPlayer (SURVEY.md §3.2); pieces pre-jitted.
        eval_fn = self._eval_fn()
        for _ in range(sims):
            self._key, k, k2 = jax.random.split(self._key, 3)
            trees = self._find(trees, jax.random.split(k, 1))
            obs = self._observe(trees)
            pi, v = eval_fn(obs)
            trees = self._process_trees(
                trees, jnp.asarray(v), jnp.asarray(pi), jax.random.split(k2, 1)
            )
        return trees

    def play(self, state) -> int:
        sims = int(self.args.numMCTSSims)
        trees = self._run_search(state, sims)
        self.temp = self.args.temp_scaling_fn(
            self.temp, int(state.turns), self.game_cls.MAX_TURNS
        )
        pi_b, val_b = self._stats(trees, jnp.full((1,), self.temp))
        policy = np.asarray(pi_b)[0]
        self.last_value = float(val_b[0])
        self.last_depth = int(trees.max_depth[0])
        action = int(self._rng.choice(len(policy), p=policy))
        if self.verbose:
            print(f"max tree depth: {self.last_depth}")
            print(f"value for player {int(state.player)}: {self.last_value}")
            print(f"policy: {policy}")
            print(f"confidence of action: {policy[action]}")
        return action

    def reset(self) -> None:
        self.temp = float(self.args.startTemp)

    def process(self, obs_batch):
        return self.nn.process(obs_batch)


class RawMCTSPlayer(MCTSPlayer):
    """Model-free MCTS with uniform priors and zero values
    (GenericPlayers.py:166-200)."""

    def __init__(self, game_cls, args, **kw):
        super().__init__(None, game_cls, args, **kw)
        env = self.game_cls
        spec = self.spec
        sims = int(self.args.numMCTSSims)
        eval_fn = S.uniform_eval_fn(env.ACTION_SIZE, spec.value_size)

        # Model-free → the whole search is one jitted scan (raw_search,
        # MCTS.pyx:175-183), no per-sim host round-trips.
        @jax.jit
        def _raw(states, rng):
            trees = S.init_batched_trees(env, states, sims + 2,
                                         spec.value_size)
            return S.search(env, trees, spec, eval_fn, sims, rng)

        self._raw_search = _raw

    @staticmethod
    def requires_model() -> bool:
        return False

    def _run_search(self, state, sims: int):
        states = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], state)
        self._key, sub = jax.random.split(self._key)
        return self._raw_search(states, sub)


class NativeRawMCTSPlayer(BasePlayer):
    """Model-free MCTS on the C++ host runtime (ops/native.py) — the
    low-latency interactive twin of RawMCTSPlayer. Same search semantics
    (MCTS.pyx raw search), per-move latency in the low milliseconds."""

    def __init__(self, game_cls, args, seed: int = 0, **kw):
        super().__init__(game_cls, args, **kw)
        from alphazero_general_tpu.ops import native

        if game_cls.NAME not in native.GAME_IDS:
            raise native.NativeUnavailable(
                f"native engine has no rules for {game_cls.NAME!r}"
            )
        native._load()  # build/bind eagerly so failures surface at init
        self._native = native
        self.temp = float(args.startTemp)
        self._rng = np.random.default_rng(seed)
        self._seed = seed
        self.last_value = None
        self.last_depth = 0

    def play(self, state) -> int:
        self._seed += 1
        best, counts, value, depth = self._native.raw_mcts_solve(
            self.game_cls.NAME,
            np.asarray(state.board),
            int(state.player),
            int(state.turns),
            int(self.args.numMCTSSims),
            cpuct=float(self.args.cpuct),
            fpu_reduction=float(self.args.fpu_reduction),
            min_discount=float(self.args.min_discount),
            seed=self._seed,
        )
        self.last_value = value
        self.last_depth = depth
        self.temp = self.args.temp_scaling_fn(
            self.temp, int(state.turns), self.game_cls.MAX_TURNS
        )
        if self.temp <= 1e-6:
            return int(best)
        p = counts.astype(np.float64) ** (1.0 / self.temp)
        total = p.sum()
        if total <= 0:
            valids = np.flatnonzero(np.asarray(
                self.game_cls.valid_moves(state)))
            return int(self._rng.choice(valids))
        return int(self._rng.choice(len(p), p=p / total))

    def reset(self) -> None:
        self.temp = float(self.args.startTemp)


class OneStepLookaheadPlayer(BasePlayer):
    """Env-generic one-step lookahead baseline (reference:
    envs/connect4/players.py:26-69 ``OneStepLookaheadConnect4Player``,
    generalized through ``win_state`` so every env gets the baseline):
    play an immediate win when one exists, otherwise avoid moves that hand
    the next player an immediate winning reply (two-ply scan, skipped for
    action spaces larger than ``block_scan_limit``), otherwise uniform
    random over the remaining moves."""

    def __init__(self, game_cls=None, args=None, seed: int = 0,
                 block_scan_limit: int = 512, **kw):
        super().__init__(game_cls, args, **kw)
        self._rng = np.random.default_rng(seed)
        self.block_scan_limit = block_scan_limit
        import jax

        self._step = jax.jit(game_cls.step)
        self._win = jax.jit(game_cls.win_state)
        self._valid = jax.jit(game_cls.valid_moves)

    def play(self, state) -> int:
        env = self.game_cls
        valids = np.flatnonzero(np.asarray(self._valid(state)))
        me = int(state.player)
        scan_blocks = env.ACTION_SIZE <= self.block_scan_limit
        wins, safe = [], []
        for a in valids:
            nxt = self._step(state, int(a))
            w = np.asarray(self._win(nxt))
            if w[me] > 0:
                wins.append(int(a))
                break  # an immediate win needs no further scanning
            if np.any(w > 0):
                continue  # loss/draw for us — only if nothing else exists
            if scan_blocks:
                opp = int(nxt.player)
                replies = np.flatnonzero(np.asarray(self._valid(nxt)))
                danger = any(
                    np.asarray(self._win(self._step(nxt, int(b))))[opp] > 0
                    for b in replies
                )
                if danger:
                    continue
            safe.append(int(a))
        pool = wins or safe or list(map(int, valids))
        return int(self._rng.choice(pool))


class GreedyValuePlayer(BasePlayer):
    """One-ply lookahead on env.crude_value (reference per-env greedy players,
    e.g. envs/hnefatafl/players.py:36-71)."""

    def play(self, state) -> int:
        env = self.game_cls
        valids = np.asarray(env.valid_moves(state))
        best_a, best_v = -1, -np.inf
        for a in np.flatnonzero(valids):
            nxt = env.step(state, int(a))
            # crude_value is from the perspective of the player to move in
            # `nxt`; invert to the current player's view.
            v = 1.0 - float(env.crude_value(nxt))
            if v > best_v:
                best_v, best_a = v, int(a)
        return best_a


class HumanConsolePlayer(BasePlayer):
    """Console input (reference per-env human players)."""

    @staticmethod
    def is_human() -> bool:
        return True

    def play(self, state) -> int:
        env = self.game_cls
        valids = np.asarray(env.valid_moves(state))
        print(env.display(state))
        while True:
            raw = input(f"enter action [0-{env.ACTION_SIZE - 1}]: ").strip()
            try:
                a = int(raw)
            except ValueError:
                print("not a number")
                continue
            if 0 <= a < env.ACTION_SIZE and valids[a]:
                return a
            print("invalid move")
