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
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_general_tpu.utils.misc import get_iter_file


def finalize_trajectories(records, symmetric: bool, env) -> Tuple[np.ndarray, ...]:
    """records: stacked MoveRecord pytree [K, B, ...] (time-major).

    Returns (obs [N, C, H, W], pi [N, A], value [N, V]) numpy arrays, where N
    includes symmetry expansion. Samples from unfinished games and fast-sim
    moves are dropped (SelfPlayAgent.pyx:161-165, 84-86).
    """
    obs = np.asarray(records.obs)          # [K, B, C, H, W]
    pi = np.asarray(records.pi)            # [K, B, A]
    win = np.asarray(records.win_state)    # [K, B, V]
    done = np.asarray(records.done)        # [K, B]
    fast = np.asarray(records.fast)        # [K]
    K, B = done.shape
    V = win.shape[-1]

    # Reverse fill: value target of move t = win vector of the episode end at
    # or after t (episodes delimited by done flags).
    values = np.zeros_like(win)
    valid = np.zeros((K, B), dtype=bool)
    pending = np.zeros((B, V), np.float32)
    have = np.zeros((B,), dtype=bool)
    for t in range(K - 1, -1, -1):
        ended = done[t]
        pending[ended] = win[t][ended]
        have |= ended
        values[t] = pending
        valid[t] = have & ~fast[t]

    mask = valid.reshape(-1)
    obs = obs.reshape((K * B,) + obs.shape[2:])[mask]
    pi = pi.reshape(K * B, -1)[mask]
    values = values.reshape(K * B, V)[mask]

    if symmetric and env.NUM_SYMMETRIES > 1 and len(obs):
        sym = jax.jit(jax.vmap(env.symmetries))
        obs_k, pi_k = sym(jnp.asarray(obs), jnp.asarray(pi))
        S = env.NUM_SYMMETRIES
        obs = np.asarray(obs_k).reshape((-1,) + obs.shape[1:])
        pi = np.asarray(pi_k).reshape(-1, pi.shape[1])
        values = np.repeat(values, S, axis=0)

    return obs.astype(np.float32), pi.astype(np.float32), values.astype(np.float32)


def game_stats(records) -> Tuple[np.ndarray, int, float]:
    """Wins-per-player / draws / average game length from trajectory records
    (reference: utils.py:34-54 get_game_results)."""
    win = np.asarray(records.win_state)  # [K, B, V]
    done = np.asarray(records.done)
    player = np.asarray(records.player)
    V = win.shape[-1]
    finished = win[done]  # [G, V]
    wins = finished[:, : V - 1].sum(axis=0)
    draws = int(finished[:, V - 1].sum())
    # Game length: reconstruct from done flags per column.
    lengths: List[int] = []
    K, B = done.shape
    for b in range(B):
        last = -1
        for t in range(K):
            if done[t, b]:
                # turns at the move that ended the game, relative to episode
                lengths.append(t - last)
                last = t
    avg_len = float(np.mean(lengths)) if lengths else 0.0
    del player
    return wins, draws, avg_len


class ReplayStore:
    """Per-iteration sample files + growing-window loading
    (reference: Coach.py:363-386 save, 437-519 window math)."""

    def __init__(self, data_dir: str, run_name: str):
        self.folder = os.path.join(data_dir, run_name)
        os.makedirs(self.folder, exist_ok=True)

    def path(self, iteration: int) -> str:
        return os.path.join(self.folder, get_iter_file(iteration) + ".npz")

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
        return len(glob(os.path.join(self.folder, "iteration-*.npz")))

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
