"""Device-resident replay window: the training window lives in HBM.

TPU-native replacement for the per-step host batch feed (the reference keeps
its window in host RAM and ships every minibatch through a DataLoader,
reference: alphazero/Coach.py:466-469). Here each iteration's RAW f16 samples
are uploaded to the device ONCE, the window is a fixed-size ring of device
arrays, and the jitted train step gathers its minibatch rows (and applies the
per-sample symmetry) on device — the per-step host→device traffic drops from
~batch × row bytes (measured ~12 MB/step at hnefatafl scale) to two int32
index vectors (~16 KB), which also retires the axon transfer-staging leak
(~2.9 GB/host-RSS per iteration) that previously needed a watchdog
(ROADMAP.md round-5 open item; VERDICT r4 next-round item 1).

Semantics: the logical window is "every stored row of iterations
[first, last] still resident in the ring". The ring holds ``rows`` physical
rows; when an upload wraps, the oldest resident rows are evicted (their
segments shrink). With ``rows`` sized at or above the configured window this
is exactly the host feed's window; smaller, it degrades gracefully to
"most recent ``rows`` samples" — bounded HBM by construction.

Batch DISTRIBUTION is identical to the host feed (shuffled epochs without
replacement, drop-last): the host still draws the permutation over resident
physical rows with the same numpy Generator and ships the index vector; only
the row gather moved on device (tests/test_device_window.py asserts
bit-identical training vs the host feed on the same index sequence).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: Rows per jitted ring write. One compiled program per buffer SHAPE serves
#: every upload (uploads are padded to a multiple of this).
_CHUNK = 8192


class DeviceWindow:
    """Fixed-capacity ring of training samples resident on device."""

    def __init__(self, obs_shape: Tuple[int, ...], action_size: int,
                 value_size: int, rows: int, chunk: int = _CHUNK):
        self.chunk = int(chunk)
        # Capacity rounds up to a chunk multiple so padded uploads can never
        # clamp out of bounds (dynamic_update_slice clamps starts, which
        # would silently misalign rows near the end of the ring).
        self.rows = -(-int(rows) // self.chunk) * self.chunk
        self.obs = jnp.zeros((self.rows,) + tuple(obs_shape), jnp.float16)
        self.pi = jnp.zeros((self.rows, int(action_size)), jnp.float16)
        self.val = jnp.zeros((self.rows, int(value_size)), jnp.float32)
        self.cursor = 0
        #: iteration -> list of [start, end) physical ranges (host metadata;
        #: the device never sees iteration structure).
        self.segments: Dict[int, List[Tuple[int, int]]] = {}
        self._write = jax.jit(self._write_impl, donate_argnums=(0, 1, 2))

    @staticmethod
    def _write_impl(obs_buf, pi_buf, val_buf, obs_rows, pi_rows, val_rows,
                    start):
        def upd(buf, rows):
            return jax.lax.dynamic_update_slice(
                buf, rows, (start,) + (0,) * (buf.ndim - 1))

        return upd(obs_buf, obs_rows), upd(pi_buf, pi_rows), \
            upd(val_buf, val_rows)

    @property
    def nbytes(self) -> int:
        return sum(int(b.size) * b.dtype.itemsize
                   for b in (self.obs, self.pi, self.val))

    @property
    def buffers(self) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        return (self.obs, self.pi, self.val)

    def _evict(self, start: int, end: int) -> None:
        """Remove physical range [start, end) from every segment (rows there
        are being overwritten)."""
        for it in list(self.segments):
            kept: List[Tuple[int, int]] = []
            for s, e in self.segments[it]:
                if e <= start or s >= end:
                    kept.append((s, e))
                    continue
                if s < start:
                    kept.append((s, start))
                if e > end:
                    kept.append((end, e))
            if kept:
                self.segments[it] = kept
            else:
                del self.segments[it]

    def has_iteration(self, iteration: int) -> bool:
        return iteration in self.segments

    def drop_before(self, first_iter: int) -> None:
        """Forget iterations outside the window (their rows become dead
        space reclaimed by future ring writes)."""
        for it in list(self.segments):
            if it < first_iter:
                del self.segments[it]

    def add_iteration(self, iteration: int, obs: np.ndarray, pi: np.ndarray,
                      val: np.ndarray) -> int:
        """Upload one iteration's rows (oversized inputs are uniformly
        subsampled to the ring capacity first). Returns rows stored."""
        n = len(obs)
        if n == 0:
            self.segments.setdefault(iteration, [])
            return 0
        if n > self.rows:
            # Keep a uniform subsample (deterministic stride — the cap case
            # is a misconfiguration warning, not a normal path).
            print(f"[device-window] iteration {iteration}: keeping "
                  f"{self.rows} of {n} rows (ring capacity)")
            keep = np.linspace(0, n - 1, self.rows).astype(np.int64)
            obs, pi, val = obs[keep], pi[keep], val[keep]
            n = self.rows
        n_pad = -(-n // self.chunk) * self.chunk
        if self.cursor + n_pad > self.rows:
            # Wrap: the tail [cursor, rows) is retired and writes restart at
            # 0 (tail rows < one chunk of waste on average).
            self._evict(self.cursor, self.rows)
            self.cursor = 0
        start = self.cursor
        self._evict(start, start + n_pad)
        pad = n_pad - n
        if pad:
            obs = np.concatenate([obs, np.zeros((pad,) + obs.shape[1:],
                                                obs.dtype)])
            pi = np.concatenate([pi, np.zeros((pad,) + pi.shape[1:],
                                              pi.dtype)])
            val = np.concatenate([val, np.zeros((pad,) + val.shape[1:],
                                                val.dtype)])
        for off in range(0, n_pad, self.chunk):
            self.obs, self.pi, self.val = self._write(
                self.obs, self.pi, self.val,
                jnp.asarray(obs[off:off + self.chunk], jnp.float16),
                jnp.asarray(pi[off:off + self.chunk], jnp.float16),
                jnp.asarray(val[off:off + self.chunk], jnp.float32),
                jnp.int32(start + off))
        self.segments.setdefault(iteration, []).append((start, start + n))
        self.cursor = start + n_pad
        return n

    def sync(self, store, first_iter: int, last_iter: int) -> None:
        """Make iterations [first_iter, last_iter] resident: upload the ones
        the ring doesn't hold yet (from their sample files — also the resume
        path after a restart) and forget the ones that left the window."""
        self.drop_before(first_iter)
        for it in range(first_iter, last_iter + 1):
            if self.has_iteration(it):
                continue
            data = store.load(it)
            if data is None:
                continue
            obs, pi, val = data
            self.add_iteration(it, np.asarray(obs, np.float16),
                               np.asarray(pi, np.float16),
                               np.asarray(val, np.float32))

    def indices_for(self, first_iter: int, last_iter: int) -> np.ndarray:
        """Physical rows of every resident sample of the window, in stable
        (iteration, position) order — the host-side sampling population."""
        ranges = []
        for it in range(first_iter, last_iter + 1):
            for s, e in self.segments.get(it, []):
                if e > s:
                    ranges.append(np.arange(s, e, dtype=np.int32))
        if not ranges:
            return np.zeros((0,), np.int32)
        return np.concatenate(ranges)
