from alphazero_general_tpu.mcts.tree import (  # noqa: F401
    NOISE_ALPHA_RATIO,
    SearchSpec,
    Tree,
    backup,
    best_action,
    counts,
    descend,
    find_leaf,
    init_tree,
    install_prior,
    leaf_observation,
    probs,
    process_results,
    reroot,
    resolve_value,
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

