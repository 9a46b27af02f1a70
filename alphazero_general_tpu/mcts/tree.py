"""Array-tree MCTS — the TPU-native replacement for the reference's node-based
Cython search (reference: alphazero/MCTS.pyx:49-344).

Design (mctx-style, SURVEY.md §7 stage 2): each game owns a fixed-capacity
node arena of flat arrays; selection, expansion and backup are branch-free
array programs driven by `lax.while_loop`, so a whole batch of independent
trees advances in lockstep under one jit. The reference's two-phase batching
API (`find_leaf` → central NN server → `process_results`,
SelfPlayAgent.pyx:103-151) collapses into `simulate_step`: leaves for every
game are found, evaluated in a single batched network call, and backed up —
all inside the same compiled program, no processes/queues/shared tensors.

Feature parity checklist vs MCTS.pyx (SURVEY.md §2.1):
  * PUCT with FPU reduction from seen policy      (MCTS.pyx:86-104)
  * random tie-breaking between equal children    (MCTS.pyx:76-79, via noise)
  * root Dirichlet noise, alpha = 10.83/num_valid (MCTS.pyx:20,197-206)
  * root policy temperature pi^(1/root_temp)      (MCTS.pyx:247-252)
  * depth-based value discount with inversion for
    losing values and a draw exception            (MCTS.pyx:265-287)
  * per-player value vector with draw credit      (MCTS.pyx:291-295)
  * terminal re-backup on revisit                 (MCTS.pyx:234-235)
  * counts / probs(temp) / best_action / value    (MCTS.pyx:297-344)
  * raw (uniform-prior, zero-value) search        (MCTS.pyx:175-183)

Known deliberate deviation: the reference computes the discount exponent
``i / discount_max_depth`` with C integer division under ``cdivision``
(MCTS.pyx:270), which truncates to 0 for every step below the maximum depth.
We implement the *documented* fractional discount; with the default
``min_discount = 1`` both are identity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

NOISE_ALPHA_RATIO = 10.83  # MCTS.pyx:20
DRAW_VALUE = 0.5  # MCTS.pyx:21
UNVISITED = jnp.int32(-1)
ROOT = jnp.int32(0)


class SearchSpec(NamedTuple):
    """Static search hyperparameters (hashable → usable as jit static arg).

    Mirrors the args consumed by the reference MCTS ctor (MCTS.pyx:133-145).
    """

    cpuct: float = 1.25
    fpu_reduction: float = 0.2
    root_policy_temp: float = 1.1
    root_noise_frac: float = 0.1
    min_discount: float = 1.0
    add_root_noise: bool = True
    add_root_temp: bool = True
    num_players: int = 2
    has_draw: bool = True

    @property
    def value_size(self) -> int:
        return self.num_players + int(self.has_draw)


@struct.dataclass
class Tree:
    """Fixed-capacity search tree for ONE game (batch via vmap).

    Node 0 is the root. ``children[n, a] == UNVISITED`` until the (n, a) edge
    is first traversed; node slots are allocated in visit order from
    ``next_free``. Per-node stats mirror the reference Node fields
    (MCTS.pyx:49-71): ``n``/``q``/``v``/``p``(dense prior row)/``player``/``e``.
    """

    # Env state snapshot per node (stacked pytree) — replaces the reference's
    # re-cloning of GameState along the path (MCTS.pyx:211-217).
    node_state: object
    parent: jnp.ndarray  # int32[N]
    parent_action: jnp.ndarray  # int32[N]
    children: jnp.ndarray  # int32[N, A]
    valids: jnp.ndarray  # bool[N, A]
    prior: jnp.ndarray  # float32[N, A]
    n: jnp.ndarray  # int32[N] visit counts
    q: jnp.ndarray  # float32[N] mean backed-up value (parent's perspective)
    v: jnp.ndarray  # float32[N] first-visit net value (own perspective)
    e: jnp.ndarray  # float32[N, value_size] terminal win vector
    player: jnp.ndarray  # int32[N] player to move at the node
    next_free: jnp.ndarray  # int32 scalar — next unallocated slot
    depth: jnp.ndarray  # int32 scalar — depth of last find_leaf
    max_depth: jnp.ndarray  # int32 scalar — max depth this search
    leaf: jnp.ndarray  # int32 scalar — node index of the pending leaf

    @property
    def capacity(self) -> int:
        return self.parent.shape[0]

    @property
    def action_size(self) -> int:
        return self.children.shape[1]


def init_tree(env, root_state, capacity: int, value_size: int) -> Tree:
    """Create an empty tree rooted at ``root_state``.

    Replaces MCTS.reset / fresh-MCTS-per-game (MCTS.pyx:154-160).
    """
    A = env.ACTION_SIZE
    node_state = jax.tree_util.tree_map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
        root_state,
    )
    node_state = jax.tree_util.tree_map(
        lambda buf, x: buf.at[0].set(x), node_state, root_state
    )
    return Tree(
        node_state=node_state,
        parent=jnp.full((capacity,), UNVISITED, jnp.int32),
        parent_action=jnp.full((capacity,), UNVISITED, jnp.int32),
        children=jnp.full((capacity, A), UNVISITED, jnp.int32),
        valids=jnp.zeros((capacity, A), jnp.bool_),
        prior=jnp.zeros((capacity, A), jnp.float32),
        n=jnp.zeros((capacity,), jnp.int32),
        q=jnp.zeros((capacity,), jnp.float32),
        v=jnp.zeros((capacity,), jnp.float32),
        e=jnp.zeros((capacity, value_size), jnp.float32),
        player=jnp.zeros((capacity,), jnp.int32),
        next_free=jnp.int32(1),
        depth=jnp.int32(0),
        max_depth=jnp.int32(0),
        leaf=ROOT,
    )


def _get_value(value_vec: jnp.ndarray, player: jnp.ndarray, spec: SearchSpec):
    """Per-player value with draw credit (MCTS.pyx:291-295)."""
    v = value_vec[player]
    if spec.has_draw:
        v = v + value_vec[spec.num_players] / spec.num_players
    return v


def _child_scores(tree: Tree, node: jnp.ndarray, spec: SearchSpec,
                  tiebreak: jnp.ndarray) -> jnp.ndarray:
    """PUCT scores of every action at ``node`` (MCTS.pyx:86-104).

    ``tiebreak`` is a tiny uniform perturbation standing in for the
    reference's child-list shuffle (MCTS.pyx:78-79).
    """
    child_idx = tree.children[node]
    exists = child_idx != UNVISITED
    safe_idx = jnp.where(exists, child_idx, 0)
    child_n = jnp.where(exists, tree.n[safe_idx], 0)
    child_q = jnp.where(exists, tree.q[safe_idx], 0.0)
    p = tree.prior[node]

    seen_policy = jnp.sum(jnp.where(child_n > 0, p, 0.0))
    fpu_value = tree.v[node] - spec.fpu_reduction * jnp.sqrt(seen_policy)
    sqrt_n = jnp.sqrt(tree.n[node].astype(jnp.float32))

    value_term = jnp.where(child_n > 0, child_q, fpu_value)
    explore = spec.cpuct * p * sqrt_n / (1.0 + child_n.astype(jnp.float32))
    scores = value_term + explore + tiebreak
    return jnp.where(tree.valids[node], scores, -jnp.inf)


def find_leaf(env, tree: Tree, spec: SearchSpec, rng: jnp.ndarray) -> Tree:
    """Walk from the root to a leaf, allocating at most one node
    (MCTS.pyx:208-228). Returns the tree with ``tree.leaf`` set; the caller
    evaluates the leaf's observation and calls :func:`process_results`.
    """

    # One tiebreak draw per walk, hoisted out of the loop body: ties are
    # broken randomly (the reference shuffles children at expansion,
    # MCTS.pyx:78-79) without paying an RNG call per depth step.
    tiebreak = jax.random.uniform(rng, (tree.action_size,)) * 1e-6

    def cond(carry):
        tree, node, _depth = carry
        visited = tree.n[node] > 0
        terminal = jnp.any(tree.e[node] > 0)
        return visited & ~terminal

    def body(carry):
        tree, node, depth = carry
        scores = _child_scores(tree, node, spec, tiebreak)
        action = jnp.argmax(scores).astype(jnp.int32)

        child = tree.children[node, action]
        need_alloc = child == UNVISITED
        slot = jnp.where(need_alloc, tree.next_free, child)

        def alloc(tree):
            parent_state = jax.tree_util.tree_map(
                lambda buf: buf[node], tree.node_state
            )
            child_state = env.step(parent_state, action)
            node_state = jax.tree_util.tree_map(
                lambda buf, x: buf.at[slot].set(x), tree.node_state, child_state
            )
            return tree.replace(
                node_state=node_state,
                parent=tree.parent.at[slot].set(node),
                parent_action=tree.parent_action.at[slot].set(action),
                children=tree.children.at[node, action].set(slot),
                next_free=tree.next_free + 1,
            )

        tree = jax.lax.cond(need_alloc, alloc, lambda t: t, tree)
        return tree, slot, depth + 1

    tree = tree.replace(depth=jnp.int32(0))
    tree, leaf, depth = jax.lax.while_loop(
        cond, body, (tree, ROOT, jnp.int32(0))
    )

    # Track max depth for the discount exponent (MCTS.pyx:219-221).
    max_depth = jnp.maximum(tree.max_depth, depth)
    tree = tree.replace(depth=depth, max_depth=max_depth, leaf=leaf)

    # Expand: record player / terminal vector / valid-move mask
    # (MCTS.pyx:223-226). Priors arrive later in process_results.
    def expand(tree):
        leaf_state = jax.tree_util.tree_map(
            lambda buf: buf[leaf], tree.node_state
        )
        return tree.replace(
            player=tree.player.at[leaf].set(leaf_state.player),
            e=tree.e.at[leaf].set(env.win_state(leaf_state)),
            valids=tree.valids.at[leaf].set(env.valid_moves(leaf_state)),
        )

    tree = jax.lax.cond(tree.n[leaf] == 0, expand, lambda t: t, tree)
    return tree


def leaf_observation(env, tree: Tree) -> jnp.ndarray:
    leaf_state = jax.tree_util.tree_map(lambda buf: buf[tree.leaf], tree.node_state)
    return env.observation(leaf_state)


def process_results(tree: Tree, value: jnp.ndarray, pi: jnp.ndarray,
                    spec: SearchSpec, rng: jnp.ndarray,
                    add_root_noise: bool | jnp.ndarray = None,
                    add_root_temp: bool | jnp.ndarray = None) -> Tree:
    """Install priors at the pending leaf and back the value up the path
    (MCTS.pyx:230-289).
    """
    if add_root_noise is None:
        add_root_noise = spec.add_root_noise
    if add_root_temp is None:
        add_root_temp = spec.add_root_temp
    leaf = tree.leaf
    is_terminal = jnp.any(tree.e[leaf] > 0)
    value = jnp.where(is_terminal, tree.e[leaf], value)

    # ---- policy installation (non-terminal leaves) --------------------------
    valids = tree.valids[leaf]
    masked = jnp.where(valids, pi, 0.0)
    norm = jnp.sum(masked)
    masked = jnp.where(norm > 0, masked / norm,
                       valids.astype(jnp.float32) /
                       jnp.maximum(jnp.sum(valids), 1))

    is_root = leaf == ROOT

    def with_root_adjust(p):
        # Root temperature (MCTS.pyx:247-252).
        temped = jnp.where(
            jnp.asarray(add_root_temp),
            _renorm(jnp.where(valids, p ** (1.0 / spec.root_policy_temp), 0.0)),
            p,
        )
        # Dirichlet noise, alpha = NOISE_ALPHA_RATIO / num_valid
        # (MCTS.pyx:197-206). Sampled densely and masked to valid moves.
        num_valid = jnp.maximum(jnp.sum(valids), 1)
        alpha = NOISE_ALPHA_RATIO / num_valid.astype(jnp.float32)
        gam = jax.random.gamma(rng, alpha, (p.shape[0],))
        gam = jnp.where(valids, gam, 0.0)
        noise = gam / jnp.maximum(jnp.sum(gam), 1e-30)
        noised = temped * (1 - spec.root_noise_frac) + spec.root_noise_frac * noise
        noised = jnp.where(valids, noised, 0.0)
        return jnp.where(jnp.asarray(add_root_noise), noised, temped)

    new_prior = jnp.where(is_root, with_root_adjust(masked), masked)
    prior = jnp.where(
        is_terminal, tree.prior[leaf], new_prior
    )
    tree = tree.replace(prior=tree.prior.at[leaf].set(prior))

    # ---- backup (MCTS.pyx:260-289) -----------------------------------------
    def cond(carry):
        tree, node, _i = carry
        return node != ROOT

    def body(carry):
        tree, node, i = carry
        par = tree.parent[node]
        val = _get_value(value, tree.player[par], spec)
        frac = i.astype(jnp.float32) / jnp.maximum(
            tree.max_depth.astype(jnp.float32), 1.0
        )
        discount = spec.min_discount ** frac
        discount = jnp.where(val < DRAW_VALUE, 2.0 - discount, discount)
        discount = jnp.where(val == DRAW_VALUE, 1.0, discount)

        n = tree.n[node].astype(jnp.float32)
        new_q = (tree.q[node] * n + val * discount) / (n + 1.0)
        own_v = _get_value(value, tree.player[node], spec)
        new_v = jnp.where(tree.n[node] == 0, own_v, tree.v[node])
        tree = tree.replace(
            q=tree.q.at[node].set(new_q),
            v=tree.v.at[node].set(new_v),
            n=tree.n.at[node].set(tree.n[node] + 1),
        )
        return tree, par, i + 1

    tree, _, _ = jax.lax.while_loop(cond, body, (tree, leaf, jnp.int32(0)))
    # Root visit increment (MCTS.pyx:289); also set root's own v on first
    # expansion so FPU at the root has a value to reduce from.
    root_v = jnp.where(
        tree.n[ROOT] == 0, _get_value(value, tree.player[ROOT], spec),
        tree.v[ROOT],
    )
    tree = tree.replace(
        n=tree.n.at[ROOT].add(1),
        v=tree.v.at[ROOT].set(root_v),
    )
    return tree


def _renorm(p: jnp.ndarray) -> jnp.ndarray:
    return p / jnp.maximum(jnp.sum(p), 1e-30)


# ---------------------------------------------------------------------------
# Root statistics (MCTS.pyx:297-344)
# ---------------------------------------------------------------------------

def counts(tree: Tree) -> jnp.ndarray:
    child_idx = tree.children[ROOT]
    exists = child_idx != UNVISITED
    safe = jnp.where(exists, child_idx, 0)
    return jnp.where(exists, tree.n[safe], 0)


def probs(tree: Tree, temp: jnp.ndarray) -> jnp.ndarray:
    """Visit-count policy with temperature; temp == 0 → argmax one-hot
    (MCTS.pyx:308-327). Computed in log space so large 1/temp cannot overflow
    (the reference catches OverflowError instead)."""
    c = counts(tree).astype(jnp.float32)
    total = jnp.maximum(jnp.sum(c), 1.0)
    frac = c / total
    logf = jnp.where(c > 0, jnp.log(jnp.maximum(frac, 1e-30)), -jnp.inf)
    temp = jnp.asarray(temp, jnp.float32)
    safe_temp = jnp.maximum(temp, 1e-6)
    scaled = logf / safe_temp
    scaled = scaled - jnp.max(jnp.where(jnp.isfinite(scaled), scaled, -jnp.inf))
    p = jnp.where(jnp.isfinite(scaled), jnp.exp(scaled), 0.0)
    p = _renorm(p)
    onehot = jax.nn.one_hot(jnp.argmax(c), c.shape[0], dtype=jnp.float32)
    return jnp.where(temp <= 1e-6, onehot, p)


def best_action(tree: Tree) -> jnp.ndarray:
    return jnp.argmax(counts(tree)).astype(jnp.int32)


def root_value(tree: Tree, average: bool = False) -> jnp.ndarray:
    """Max (or mean) q over visited root children (MCTS.pyx:329-344)."""
    child_idx = tree.children[ROOT]
    exists = child_idx != UNVISITED
    safe = jnp.where(exists, child_idx, 0)
    child_n = jnp.where(exists, tree.n[safe], 0)
    child_q = jnp.where(exists & (child_n > 0), tree.q[safe], 0.0)
    if average:
        return jnp.sum(child_q) / jnp.maximum(jnp.sum(tree.valids[ROOT]), 1)
    return jnp.max(child_q)
