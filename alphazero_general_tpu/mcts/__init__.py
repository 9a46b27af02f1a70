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
from alphazero_general_tpu.mcts.search import (  # noqa: F401
    init_batched_trees,
    raw_search,
    search,
    simulate_step,
    uniform_eval_fn,
)
