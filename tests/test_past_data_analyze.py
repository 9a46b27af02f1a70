"""train_on_past_data pre-training + analyze CLI tests."""

import pytest
import os
from glob import glob

import numpy as np

from alphazero_general_tpu.envs.tictactoe import TicTacToe
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.selfplay import ReplayStore
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

# Integration tier: full Coach cycles / sweeps — deselect with -m 'not slow' for the quick tier.
pytestmark = pytest.mark.slow


def test_train_on_past_data(tmp_path, capsys):
    # Fabricate a past run with 3 iterations of samples.
    past = ReplayStore(str(tmp_path / "data"), "old_run")
    rng = np.random.default_rng(0)
    for it in range(1, 4):
        past.save(
            it,
            rng.random((40, 1, 3, 3)).astype(np.float32),
            np.full((40, 9), 1 / 9, np.float32),
            np.full((40, 3), 1 / 3, np.float32),
        )

    args = get_args(
        run_name="newrun",
        checkpoint=str(tmp_path / "ckpt"),
        data=str(tmp_path / "data"),
        train_on_past_data=True,
        past_data_run_name="old_run",
        past_data_chunk_size=2,
        numIters=1,
        compareWithBaseline=False,
        compareWithPast=False,
        train_batch_size=16,
        num_channels=4, depth=1,
        value_dense_layers=[8], policy_dense_layers=[8],
        value_head_channels=2, policy_head_channels=2,
        compute_dtype="float32",
    )
    net = NNetWrapper(TicTacToe, args)
    coach = Coach(TicTacToe, net, args)
    coach.learn()
    out = capsys.readouterr().out
    assert "2 chunks" in out
    assert coach.loss_pi > 0
    # Trained checkpoint written without any self-play data of its own.
    assert glob(os.path.join(str(tmp_path / "ckpt"), "newrun",
                             "iteration-0001.ckpt"))
    assert not os.path.exists(os.path.join(str(tmp_path / "data"), "newrun",
                                           "iteration-0001.npz"))


def test_analyze_cli(capsys):
    from alphazero_general_tpu.cli.analyze import main

    rc = main(["tictactoe", "--moves", "0,3,1,4", "--sims", "120"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "value (mover):" in out
    # Position: p0 wins immediately at cell 2 — the top suggestion. (A
    # model-free zero-value analysis finds its own wins; it cannot rank
    # BLOCKS, because terminal losses and neutral evals both back up 0 —
    # exactly the reference's raw-search math, MCTS.pyx:175-183/291-295.)
    assert "1. action 2" in out


def test_analyze_cli_terminal(capsys):
    from alphazero_general_tpu.cli.analyze import main

    rc = main(["tictactoe", "--moves", "0,3,1,4,2"])
    assert rc == 0
    assert "terminal" in capsys.readouterr().out
