from alphazero_general_tpu.mcts.tree import (  # noqa: F401
    NOISE_ALPHA_RATIO,
    SearchSpec,
    Tree,
    best_action,
    counts,
    find_leaf,
    init_tree,
    leaf_observation,
    probs,
    process_results,
    root_value,
)
from alphazero_general_tpu.mcts import search as search_lib  # noqa: F401
from alphazero_general_tpu.mcts.search import (  # noqa: F401
    init_batched_trees,
    raw_search,
    simulate_step,
    uniform_eval_fn,
)
from alphazero_general_tpu.mcts.search import search as run_search  # noqa: F401

