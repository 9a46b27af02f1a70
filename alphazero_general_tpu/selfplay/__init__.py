from alphazero_general_tpu.selfplay.selfplay import (  # noqa: F401
    MoveRecord,
    SelfPlayConfig,
    SelfPlayState,
    init_selfplay,
    make_move_fns,
    make_play_chunk_fn,
    move_step,
    play_chunk,
)
from alphazero_general_tpu.selfplay.replay import (  # noqa: F401
    ReplayStore,
    batch_iterator,
    finalize_trajectories,
    game_stats,
    history_window,
)
from alphazero_general_tpu.selfplay.arena import (  # noqa: F401
    ArenaConfig,
    ArenaResult,
    make_arena_fn,
    winrates,
)
from alphazero_general_tpu.selfplay.arena import play_games as arena_play_games  # noqa: F401
