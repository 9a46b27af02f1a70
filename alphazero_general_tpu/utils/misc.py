"""Small utilities: temperature schedules, meters, file naming.

Covers the reference's alphazero/utils.py:15-54 and the vendored
AverageMeter (alphazero/pytorch_classification/utils/misc.py:14-33) —
re-implemented, not copied.
"""

from __future__ import annotations


def get_iter_file(iteration: int) -> str:
    """Checkpoint file name for an iteration (reference: utils.py:15-16)."""
    return f"iteration-{iteration:04d}"


def scale_temp(scale_factor: float, min_temp: float, cur_temp: float,
               turns: int, const_max_turns: int) -> float:
    """Halve the temperature every ``scale_factor * max_turns`` turns with a
    floor of ``min_temp`` (reference: utils.py:19-27)."""
    period = int(scale_factor * const_max_turns) if const_max_turns else 0
    if period and (turns + 1) % period == 0:
        return max(min_temp, cur_temp / 2)
    return cur_temp


def default_temp_scaling(cur_temp: float, turns: int, max_turns: int) -> float:
    return scale_temp(0.15, 0.2, cur_temp, turns, max_turns)


def const_temp_scaling(temp: float, *args, **kwargs) -> float:
    return temp


def convert_checkpoint_file(filepath: str, env, args=None,
                            overwrite_args: bool = False) -> str:
    """Round-trip a checkpoint through the current wrapper so old formats /
    stale embedded args migrate to the current schema (reference:
    alphazero/utils.py:86-90). ``filepath`` may include or omit the
    ``.ckpt`` suffix; the sibling ``.json`` args file is refreshed too.
    With ``overwrite_args`` the provided ``args`` replace the saved ones."""
    import os

    from alphazero_general_tpu.models.wrapper import NNetWrapper
    from alphazero_general_tpu.utils.config import get_args

    if filepath.endswith(".ckpt"):
        filepath = filepath[: -len(".ckpt")]
    folder, filename = os.path.split(filepath)
    if overwrite_args:
        wrapper = NNetWrapper(env, get_args(args))
        wrapper.load_checkpoint(folder, filename)
    else:
        wrapper = NNetWrapper.from_checkpoint(env, folder, filename,
                                              override_args=args)
    return wrapper.save_checkpoint(folder, filename)


def map_value(value, in_min, in_max, out_min, out_max):
    return (value - in_min) * (out_max - out_min) / (in_max - in_min) + out_min


class AverageMeter:
    """Running average of a scalar (console / GUI progress surface)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Bar:
    """Terminal progress bar with rate + ETA (reference surface: the vendored
    pytorch_classification progress Bar, progress/bar.py:22-42 —
    ``Bar(msg, max=N)`` / ``.suffix`` / ``.next()`` / ``.finish()``).

    Renders in place via carriage return on a TTY; on non-TTY streams (logs,
    CI) it stays silent except for the final newline summary, so archived
    consoles don't fill with control characters. ``next(k)`` advances by k.
    """

    WIDTH = 24

    def __init__(self, message: str = "", max: int = 100):  # noqa: A002
        import sys
        import time

        self.message = message
        self.max = int(max) or 1
        self.index = 0
        self.suffix = ""
        self._start = time.perf_counter()
        self._stream = sys.stderr
        self._tty = hasattr(self._stream, "isatty") and self._stream.isatty()
        self._last_draw = 0.0

    def _eta(self) -> str:
        import time

        elapsed = time.perf_counter() - self._start
        if self.index <= 0:
            return "--:--"
        remain = elapsed / self.index * (self.max - self.index)
        m, s = divmod(int(remain), 60)
        h, m = divmod(m, 60)
        return f"{h:d}:{m:02d}:{s:02d}" if h else f"{m:02d}:{s:02d}"

    def _draw(self, force: bool = False) -> None:
        import time

        if not self._tty:
            return
        now = time.perf_counter()
        if not force and now - self._last_draw < 0.1:  # throttle redraws
            return
        self._last_draw = now
        frac = min(self.index / self.max, 1.0)
        fill = int(self.WIDTH * frac)
        bar = "#" * fill + "-" * (self.WIDTH - fill)
        line = (f"\r{self.message} |{bar}| {self.index}/{self.max} "
                f"eta {self._eta()} {self.suffix}")
        self._stream.write(line[:119] + "\x1b[K")
        self._stream.flush()

    def next(self, n: int = 1) -> None:
        self.index += n
        self._draw()

    def goto(self, index: int) -> None:
        self.index = int(index)
        self._draw()

    def finish(self) -> None:
        import time

        self._draw(force=True)
        if self._tty:
            self._stream.write("\n")
            self._stream.flush()
        else:  # one summary line for non-TTY consoles
            elapsed = time.perf_counter() - self._start
            self._stream.write(
                f"{self.message} {self.index}/{self.max} in {elapsed:.1f}s"
                f" {self.suffix}\n")
            self._stream.flush()
