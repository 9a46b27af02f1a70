"""End-to-end tiny training runs — the real-pytest version of the reference's
manual integration fixture (reference: envs/hnefatafl/train_test.py:17-54,
SURVEY.md §4)."""

import os
from glob import glob

import numpy as np
import pytest

from alphazero_general_tpu.envs.tictactoe import TicTacToe
from alphazero_general_tpu.models import NNetWrapper
from alphazero_general_tpu.train import Coach
from alphazero_general_tpu.utils.config import get_args

# Integration tier: full Coach cycles / sweeps — deselect with -m 'not slow' for the quick tier.
pytestmark = pytest.mark.slow


def tiny_args(tmp_path, **kw):
    base = dict(
        run_name="test",
        checkpoint=str(tmp_path / "checkpoint"),
        data=str(tmp_path / "data"),
        numIters=2,
        process_batch_size=8,
        gamesPerIteration=8,
        numMCTSSims=6,
        numFastSims=3,
        numWarmupSims=4,
        numWarmupIters=1,
        probFastSim=0.4,
        train_batch_size=16,
        arenaCompare=8,
        arenaCompareBaseline=8,
        arenaTemp=1.0,
        num_channels=8,
        depth=1,
        value_head_channels=2,
        policy_head_channels=2,
        value_dense_layers=[8],
        policy_dense_layers=[8],
        compute_dtype="float32",
        selfplay_chunk_moves=10,
        minTrainHistoryWindow=2,
        maxTrainHistoryWindow=4,
    )
    base.update(kw)
    return get_args(**base)


@pytest.fixture(scope="module")
def finished_run(tmp_path_factory):
    """One tiny 2-iteration run, shared by the assertions below."""
    tmp_path = tmp_path_factory.mktemp("coach")
    args = tiny_args(tmp_path)
    net = NNetWrapper(TicTacToe, args)
    coach = Coach(TicTacToe, net, args)
    coach.learn()
    return tmp_path, args, coach


class TestEndToEnd:
    def test_checkpoints_written(self, finished_run):
        tmp_path, args, coach = finished_run
        ckpts = sorted(glob(os.path.join(args.checkpoint, "test", "*.ckpt")))
        # iteration-0000 (init) + one per iteration.
        assert len(ckpts) == 3

    def test_samples_written(self, finished_run):
        tmp_path, args, coach = finished_run
        data = sorted(glob(os.path.join(args.data, "test", "*.npz")))
        assert len(data) == 2
        z = np.load(data[0])
        assert z["obs"].shape[1:] == (1, 3, 3)
        assert z["pi"].shape[1:] == (9,)
        assert z["value"].shape[1:] == (3,)
        assert len(z["obs"]) > 0
        # Symmetric expansion: multiples of 8 copies.
        assert len(z["obs"]) % 8 == 0

    def test_metrics_written(self, finished_run):
        tmp_path, args, coach = finished_run
        path = os.path.join("runs", "test", "metrics.jsonl")
        assert os.path.exists(path)
        import json

        tags = {json.loads(line)["tag"] for line in open(path)}
        for expected in ("loss/policy", "loss/value", "loss/total",
                         "win_rate/player0", "win_rate/baseline",
                         "win_rate/past", "win_rate/self_play_model"):
            assert expected in tags, f"missing metric {expected}"

    def test_losses_finite(self, finished_run):
        _, _, coach = finished_run
        assert np.isfinite(coach.loss_pi) and coach.loss_pi > 0
        assert np.isfinite(coach.loss_v)

    def test_resume_from_checkpoints(self, finished_run):
        tmp_path, args, coach = finished_run
        args2 = tiny_args(tmp_path, numIters=3)
        net2 = NNetWrapper(TicTacToe, args2)
        coach2 = Coach(TicTacToe, net2, args2)
        # Resume discovery counted the existing checkpoints (Coach.py:165-173).
        assert coach2.model_iter == 3
        coach2.learn()
        ckpts = sorted(glob(os.path.join(args.checkpoint, "test", "*.ckpt")))
        assert len(ckpts) == 4
