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
    finalize_sparse,
    finalize_trajectories,
    game_stats,
    game_stats_arrays,
    history_window,
)
from alphazero_general_tpu.selfplay.arena import (  # noqa: F401
    ArenaConfig,
    ArenaResult,
    make_arena_fn,
    make_multi_arena_fn,
    play_games_multi,
    winrates,
)
from alphazero_general_tpu.selfplay.arena import play_games as arena_play_games  # noqa: F401
