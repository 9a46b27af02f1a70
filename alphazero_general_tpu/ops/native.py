"""ctypes binding + on-demand build of the C++ host runtime (native/).

The library is compiled once per machine with g++ (no pybind11 dependency —
plain C ABI via ctypes) and cached next to the source. Falls back gracefully:
callers must check :func:`available` or catch :class:`NativeUnavailable`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "azg_native.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libazg_native.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None

GAME_IDS = {"connect4": 0, "tictactoe": 1}
ACTION_SIZES = {"connect4": 7, "tictactoe": 9}
BOARD_SIZES = {"connect4": 42, "tictactoe": 9}


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeUnavailable(
            f"native build failed:\n{proc.stderr[-2000:]}"
        )
    return _LIB


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            raise NativeUnavailable(_build_error)
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, NativeUnavailable) as e:
            _build_error = str(e)
            raise NativeUnavailable(_build_error) from e
        lib.azg_raw_mcts_solve.restype = ctypes.c_int
        lib.azg_raw_mcts_solve.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def raw_mcts_solve(game: str, board: np.ndarray, player: int, turns: int,
                   sims: int, cpuct: float = 1.25, fpu_reduction: float = 0.2,
                   min_discount: float = 1.0, seed: int = 0):
    """Run the native raw-MCTS on a single position.

    Returns (best_action, counts int32[A], root_value, max_depth).
    """
    lib = _load()
    gid = GAME_IDS[game]
    A = ACTION_SIZES[game]
    flat = np.ascontiguousarray(board, dtype=np.int8).reshape(-1)
    assert flat.size == BOARD_SIZES[game], flat.size
    counts = np.zeros(A, np.int32)
    value = ctypes.c_float(0.0)
    depth = ctypes.c_int32(0)
    best = lib.azg_raw_mcts_solve(
        gid,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        int(player), int(turns), int(sims),
        float(cpuct), float(fpu_reduction), float(min_discount),
        int(seed) & 0xFFFFFFFF,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(value), ctypes.byref(depth),
    )
    if best < 0:
        raise NativeUnavailable(f"unknown native game {game!r}")
    return int(best), counts, float(value.value), int(depth.value)
