from alphazero_general_tpu.players.players import (  # noqa: F401
    BasePlayer,
    GreedyValuePlayer,
    HumanConsolePlayer,
    MCTSPlayer,
    NNPlayer,
    OneStepLookaheadPlayer,
    RandomPlayer,
    RawMCTSPlayer,
)
