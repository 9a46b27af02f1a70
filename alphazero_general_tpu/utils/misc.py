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
