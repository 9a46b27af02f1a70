"""Live position analysis service.

Parity with the reference evaluator (reference: alphazero/Evaluator.py:
225-440): a daemon thread incrementally searches the current position and
publishes (value, best actions, depth, sims) under a lock, with max-time /
max-depth / max-sims cutoffs, a uniform-prior fallback when no model is given
(Evaluator.py:366-372), and a crude-value "greedy model" helper
(Evaluator.py:405-410). Consumed by the web UI's eval bar / move hints and by
the CLI `analyze` tool.
"""

from __future__ import annotations

import atexit
import threading
import time
import weakref
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import alphazero_general_tpu.mcts.search as S
import alphazero_general_tpu.mcts.tree as T

#: Evaluators with a live worker thread. Daemon threads that are still inside
#: an XLA execute/compile when the interpreter tears down die by
#: pthread_cancel mid-C++ frame ("FATAL: exception not rethrown" /
#: segfault-at-exit — observed in long pytest runs). Stop them gracefully
#: at exit instead.
_LIVE: "weakref.WeakSet" = weakref.WeakSet()


@atexit.register
def _stop_live_evaluators() -> None:
    for ev in list(_LIVE):
        try:
            t = ev._thread
            if t is not None and t.is_alive():
                print("[evaluator] waiting for the in-flight analysis tick "
                      "to finish (an XLA compile cannot be cancelled)...")
            # Generous bounded join: a tick caught mid-compile cannot be
            # cancelled, and exiting under it aborts in C++ teardown. The
            # bound keeps a wedged backend (e.g. a stale remote-TPU grant)
            # from hanging exit forever — in that corner the abort-at-exit
            # is accepted.
            ev.stop(timeout=120.0)
        except Exception:
            pass


@dataclass
class Analysis:
    value: float = 0.5
    best_actions: List[int] = field(default_factory=list)
    #: visited root actions with the lowest q — the GUI's worst-move hints
    #: (reference: CustomGUI.py:463-507 best/worst move display)
    worst_actions: List[int] = field(default_factory=list)
    policy: Optional[np.ndarray] = None
    depth: int = 0
    sims: int = 0
    elapsed: float = 0.0
    running: bool = False


class MCTSEvaluator:
    """Incremental analysis on a background thread (Evaluator.py:326-402)."""

    def __init__(self, env, args, nn=None, max_search_time: float = 10.0,
                 max_search_depth: Optional[int] = None,
                 max_sims: int = 2000, sims_per_tick: int = 8,
                 num_best: int = 3, seed: int = 0):
        self.env = env
        self.args = args
        self.nn = nn
        self.max_search_time = max_search_time
        self.max_search_depth = max_search_depth
        self.max_sims = max_sims
        self.sims_per_tick = sims_per_tick
        self.num_best = num_best

        self.spec = T.SearchSpec(
            cpuct=float(args.cpuct),
            fpu_reduction=float(args.fpu_reduction),
            min_discount=float(args.min_discount),
            add_root_noise=False,
            add_root_temp=False,
            num_players=env.NUM_PLAYERS,
            has_draw=env.HAS_DRAW,
        )
        self._value_size = env.NUM_PLAYERS + int(env.HAS_DRAW)
        self._key = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._analysis = Analysis()

        if nn is not None:
            model = nn.model
            variables = nn.state.variables

            def eval_fn(obs):
                logp, logv = model.apply(variables, obs, train=False)
                return jnp.exp(logp), jnp.exp(logv)
        else:
            eval_fn = S.uniform_eval_fn(env.ACTION_SIZE, self._value_size)

        env_ = self.env
        spec = self.spec
        tick_sims = self.sims_per_tick

        @jax.jit
        def _tick(trees, rng, first):
            def one(tr, r, adjust):
                return S.simulate_step(env_, tr, spec, eval_fn, r,
                                       root_adjust=adjust, walk_impl="xla")

            rngs = jax.random.split(rng, tick_sims)
            trees = jax.lax.cond(
                first,
                lambda tr: one(tr, rngs[0], True),
                lambda tr: one(tr, rngs[0], False),
                trees,
            )
            def body(tr, r):
                return one(tr, r, False), None
            trees, _ = jax.lax.scan(body, trees, rngs[1:])
            return trees

        self._tick = _tick

    # ------------------------------------------------------------------ api
    @property
    def analysis(self) -> Analysis:
        with self._lock:
            return Analysis(**vars(self._analysis))

    def start(self, state) -> None:
        """(Re)start analysis of ``state``; cancels any running analysis."""
        self.stop()
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._run, args=(state,), daemon=True
        )
        _LIVE.add(self)
        self._thread.start()

    def stop(self, timeout: Optional[float] = 5.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=timeout)
            self._thread = None

    def analyze_blocking(self, state, sims: Optional[int] = None) -> Analysis:
        """Synchronous analysis (CLI/analyze surface)."""
        saved = self.max_sims
        if sims is not None:
            self.max_sims = sims
        try:
            self._run(state)
        finally:
            self.max_sims = saved
        return self.analysis

    # ------------------------------------------------------------- internals
    def _publish(self, trees, sims_done: int, elapsed: float, running: bool):
        counts_b, q_b = jax.vmap(T.root_child_stats)(trees)
        counts = np.asarray(counts_b)[0]
        q = np.asarray(q_b)[0]
        order = np.argsort(-counts)
        best = [int(a) for a in order[: self.num_best] if counts[a] > 0]
        visited = counts > 0
        worst_order = np.argsort(np.where(visited, q, np.inf))
        worst = [int(a) for a in worst_order[: self.num_best]
                 if visited[a] and int(a) not in best]
        value = float(jax.vmap(lambda t: T.root_value(t))(trees)[0])
        policy = counts / counts.sum() if counts.sum() else None
        with self._lock:
            self._analysis = Analysis(
                value=value,
                best_actions=best,
                worst_actions=worst,
                policy=policy,
                depth=int(trees.max_depth[0]),
                sims=sims_done,
                elapsed=elapsed,
                running=running,
            )

    def _run(self, state) -> None:
        try:
            self._run_inner(state)
        except Exception:
            # Interpreter/test teardown can interrupt a tick mid-trace
            # (daemon thread); stay quiet when a stop was requested — but
            # leave a trace so a genuine failure racing a stop() is not
            # silently lost.
            if not self._stop.is_set():
                raise
            import logging

            logging.getLogger(__name__).debug(
                "evaluator tick failed after stop()", exc_info=True)

    def _run_inner(self, state) -> None:
        env = self.env
        if bool(np.asarray(env.terminated(state))):
            with self._lock:
                self._analysis = Analysis(running=False)
            return
        states = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], state)
        trees = S.init_batched_trees(
            env, states, self.max_sims + 2, self._value_size
        )
        start = time.time()
        sims_done = 0
        first = True
        while (
            not self._stop.is_set()
            and sims_done < self.max_sims
            and time.time() - start < self.max_search_time
        ):
            self._key, sub = jax.random.split(self._key)
            trees = self._tick(trees, sub, jnp.bool_(first))
            first = False
            sims_done += self.sims_per_tick
            elapsed = time.time() - start
            self._publish(trees, sims_done, elapsed, running=True)
            if (self.max_search_depth is not None
                    and int(trees.max_depth[0]) >= self.max_search_depth):
                break
        self._publish(trees, sims_done, time.time() - start, running=False)


def greedy_value(env, state) -> float:
    """Heuristic evaluation via env.crude_value (Evaluator.py:405-410)."""
    return float(np.asarray(env.crude_value(state)))
