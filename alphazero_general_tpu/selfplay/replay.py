"""Trajectory post-processing and the replay store.

Replaces the reference's file_queue → saveIterationSamples path (reference:
alphazero/SelfPlayAgent.pyx:176-196, Coach.py:363-386): the jitted self-play
loop emits fixed-shape per-move records; a reverse pass attaches each game's
final win vector to every move of that game (the jit-friendly equivalent of
emitting samples only at game end), symmetry expansion runs as one vmapped
program, and per-iteration sample tensors are persisted as ``.npz`` under
``data/<run>/iteration-NNNN.npz`` mirroring the reference's three ``.pkl``
tensors.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_general_tpu.utils.misc import get_iter_file


def finalize_sparse(win, done, fast, obs_f, pi_f, full_idx, symmetric: bool,
                    env) -> Tuple[np.ndarray, ...]:
    """Attach episode results to samples and expand symmetries.

    Sparse-sample form: the self-play loop only materializes observations and
    policies for non-fast move rounds (fast-sim samples are discarded anyway,
    SelfPlayAgent.pyx:84-86, 161-165), so ``obs_f [Kf, B, ...]`` /
    ``pi_f [Kf, B, A]`` cover just the ``Kf`` rounds listed in ``full_idx``
    while ``win [K, B, V]`` / ``done [K, B]`` / ``fast [K]`` cover every
    round. Returns (obs [N, C, H, W], pi [N, A], value [N, V]) float32 numpy
    arrays; samples from unfinished games are dropped.
    """
    win = np.asarray(win)
    done = np.asarray(done)
    fast = np.asarray(fast)
    K, B = done.shape
    V = win.shape[-1]

    # Reverse fill: value target of move t = win vector of the episode end at
    # or after t (episodes delimited by done flags); vectorized over B.
    values = np.zeros((K, B, V), np.float32)
    valid = np.zeros((K, B), dtype=bool)
    pending = np.zeros((B, V), np.float32)
    have = np.zeros((B,), dtype=bool)
    for t in range(K - 1, -1, -1):
        ended = done[t]
        pending[ended] = win[t][ended]
        have |= ended
        values[t] = pending
        valid[t] = have & ~fast[t]

    full_idx = np.asarray(full_idx)
    Kf = len(full_idx)
    if Kf == 0:
        A = np.asarray(pi_f).shape[-1] if np.asarray(pi_f).ndim else 0
        return (np.zeros((0,) + np.asarray(obs_f).shape[2:], np.float32),
                np.zeros((0, A), np.float32), np.zeros((0, V), np.float32))
    mask = valid[full_idx].reshape(-1)  # [Kf*B]
    obs = np.asarray(obs_f, np.float32).reshape(
        (Kf * B,) + obs_f.shape[2:])[mask]
    pi = np.asarray(pi_f, np.float32).reshape(Kf * B, -1)[mask]
    values = values[full_idx].reshape(Kf * B, V)[mask]

    if symmetric and env.NUM_SYMMETRIES > 1 and len(obs):
        obs, pi = _expand_symmetries(env, obs, pi)
        values = np.repeat(values, env.NUM_SYMMETRIES, axis=0)

    return obs.astype(np.float32), pi.astype(np.float32), values.astype(np.float32)


#: Samples per device round of symmetry expansion. Bounds finalize HBM to
#: ~chunk × S × (obs + pi) regardless of iteration size — a long-game,
#: large-A env (stratego: 512-move draw cap × A=1280) can emit hundreds of
#: thousands of samples per iteration, and expanding them in one program was
#: measured to RESOURCE_EXHAUST the chip at warmup.
_SYM_CHUNK = 8192
_SYM_JITS: dict = {}


def _bucket(m: int) -> int:
    """Round a sub-chunk batch up to a power-of-2 bucket so repeated
    finalizes with varying sample counts reuse a handful of compiled
    shapes instead of compiling one program per distinct n."""
    b = 256
    while b < m:
        b *= 2
    return min(b, _SYM_CHUNK)


def _expand_symmetries(env, obs: np.ndarray, pi: np.ndarray):
    """Symmetry expansion in fixed-shape device chunks (host-accumulated)."""
    # Keyed on the bound symmetry function, not just the env name: a rebuilt
    # env with the same NAME but a different closure must not silently reuse
    # the first instance's jitted program. The env is kept in the value to
    # hold a strong reference (id() reuse after GC).
    key = (env.NAME, id(env))
    if key not in _SYM_JITS:
        _SYM_JITS[key] = (env, jax.jit(jax.vmap(env.symmetries)))
    sym = _SYM_JITS[key][1]
    S = env.NUM_SYMMETRIES
    n = len(obs)
    out_o = np.empty((n * S,) + obs.shape[1:], np.float32)
    out_p = np.empty((n * S, pi.shape[1]), np.float32)
    for i in range(0, n, _SYM_CHUNK):
        o, p = obs[i:i + _SYM_CHUNK], pi[i:i + _SYM_CHUNK]
        m = len(o)
        if m < _SYM_CHUNK:
            # Pad the tail (or an under-chunk batch) up to a power-of-2
            # bucket; vmapped expansion is per-sample, so the pad rows are
            # sliced off after reshape.
            b = _SYM_CHUNK if n > _SYM_CHUNK else _bucket(m)
            o = np.concatenate([o, np.zeros((b - m,) + o.shape[1:],
                                            o.dtype)])
            p = np.concatenate([p, np.zeros((b - m, p.shape[1]),
                                            p.dtype)])
        ok, pk = sym(jnp.asarray(o), jnp.asarray(p))
        ok = np.asarray(ok).reshape((-1,) + obs.shape[1:])[: m * S]
        pk = np.asarray(pk).reshape(-1, pi.shape[1])[: m * S]
        out_o[i * S:i * S + m * S] = ok
        out_p[i * S:i * S + m * S] = pk
    return out_o, out_p


def finalize_trajectories(records, symmetric: bool, env) -> Tuple[np.ndarray, ...]:
    """Dense-record form of :func:`finalize_sparse`: records is a stacked
    MoveRecord pytree [K, B, ...] (time-major) carrying obs/pi for every
    round (play_chunk output)."""
    done = np.asarray(records.done)
    K = done.shape[0]
    return finalize_sparse(
        records.win_state, done, np.asarray(records.fast),
        np.asarray(records.obs), np.asarray(records.pi), np.arange(K),
        symmetric, env,
    )


def game_stats_arrays(win, done) -> Tuple[np.ndarray, int, float]:
    """Wins-per-player / draws / average game length
    (reference: utils.py:34-54 get_game_results). Vectorized: episode length
    at each done flag = distance to the previous done flag in its column."""
    win = np.asarray(win)  # [K, B, V]
    done = np.asarray(done)
    V = win.shape[-1]
    finished = win[done]  # [G, V]
    wins = finished[:, : V - 1].sum(axis=0)
    draws = int(finished[:, V - 1].sum())
    b_idx, t_idx = np.nonzero(done.T)  # sorted by column, then time
    if len(t_idx):
        first = np.empty(len(b_idx), dtype=bool)
        first[0] = True
        first[1:] = b_idx[1:] != b_idx[:-1]
        prev = np.empty_like(t_idx)
        prev[0] = -1
        prev[1:] = t_idx[:-1]
        prev[first] = -1
        avg_len = float(np.mean(t_idx - prev))
    else:
        avg_len = 0.0
    return wins, draws, avg_len


def game_stats(records) -> Tuple[np.ndarray, int, float]:
    """Dense-record form of :func:`game_stats_arrays`."""
    return game_stats_arrays(records.win_state, records.done)


class ReplayStore:
    """Per-iteration sample files + growing-window loading
    (reference: Coach.py:363-386 save, 437-519 window math)."""

    def __init__(self, data_dir: str, run_name: str):
        self.folder = os.path.join(data_dir, run_name)
        os.makedirs(self.folder, exist_ok=True)
        # Multi-process runs: each host stores/loads only its own slice of
        # the sample set (per-host data feed, parallel/mesh.py) under a
        # process-suffixed filename so hosts never clobber each other.
        self._suffix = ""
        if jax.process_count() > 1:
            self._suffix = f"-p{jax.process_index()}"

    def path(self, iteration: int) -> str:
        return os.path.join(
            self.folder, get_iter_file(iteration) + self._suffix + ".npz")

    def save(self, iteration: int, obs, pi, value) -> str:
        p = self.path(iteration)
        np.savez_compressed(p, obs=obs, pi=pi, value=value)
        return p

    def load(self, iteration: int) -> Optional[Tuple[np.ndarray, ...]]:
        p = self.path(iteration)
        if not os.path.exists(p):
            return None
        with np.load(p) as z:
            return z["obs"], z["pi"], z["value"]

    def num_iterations(self) -> int:
        return len(glob(os.path.join(
            self.folder, "iteration-*" + self._suffix + ".npz")))

    def load_window(self, first_iter: int, last_iter: int):
        """Concatenate samples of iterations [first_iter, last_iter]."""
        parts = [self.load(i) for i in range(first_iter, last_iter + 1)]
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        obs = np.concatenate([p[0] for p in parts])
        pi = np.concatenate([p[1] for p in parts])
        val = np.concatenate([p[2] for p in parts])
        return obs, pi, val


def history_window(iteration: int, min_window: int, max_window: int,
                   increment_iters: int) -> int:
    """Growing history window (reference: Coach.py:510-516)."""
    return min(
        max(min_window, (iteration + min_window) // increment_iters),
        max_window,
    )


def batch_iterator(data: Tuple[np.ndarray, ...], batch_size: int,
                   rng: np.random.Generator, drop_last: bool = True
                   ) -> Iterator[Tuple[np.ndarray, ...]]:
    """Shuffled minibatches over host arrays (replaces DataLoader,
    Coach.py:466-469)."""
    obs, pi, value = data
    n = len(obs)
    order = rng.permutation(n)
    end = n - (n % batch_size) if drop_last and n >= batch_size else n
    for start in range(0, end, batch_size):
        idx = order[start : start + batch_size]
        yield obs[idx], pi[idx], value[idx]
