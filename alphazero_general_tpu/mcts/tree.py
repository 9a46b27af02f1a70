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

Memory layout (TPU-critical): per-node row arrays (priors, valids,
env-state snapshots, terminal vectors) with SUB-TILE rows are stored
**flattened to one axis per game** — connect4's ``prior`` is
``f32[(N)*A]``; under ``vmap`` the batched buffers are 2-D ``[B, N*A]``,
which tile cleanly onto the TPU's (8,128)/(32,128) memory tiles. The naive
``[B, N, A]`` layout pads the minor A axis to 128 lanes — an 18x physical
blow-up for connect4 (A=7) that made every carried-tree copy and fusion read
~20x more HBM than the logical data (measured: 1.6x end-to-end self-play
throughput from this change). Rows at or above a lane tile (tafl's A=2420)
keep the plain ``[rows, size]`` shape — their padding is negligible and
flat<->2-D reshape views of such buffers materialize as relayout copies.
``_row``/``_set_row`` dispatch on the buffer's ndim.

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


from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

NOISE_ALPHA_RATIO = 10.83  # MCTS.pyx:20
DRAW_VALUE = 0.5  # MCTS.pyx:21
UNVISITED = jnp.int32(-1)
ROOT = jnp.int32(0)
#: The ``prior`` buffer packs the valid-move mask into the sign: invalid
#: actions store exactly -1.0 (valid priors are >= 0 after renormalization).
#: The walk then needs ONE row read instead of two (prior + valids) per
#: step; the separate bool ``valids`` buffer is still maintained for the
#: non-walk consumers (root_value, general-path install, viz).
INVALID_PRIOR = -1.0

#: ``nbp`` sentinel: the node has NO unexpanded valid action left (every
#: valid prior is strictly "above" the pointer in (prior, -index) order).
NBP_NONE = -3.0e38
#: ``nbp`` sentinel for never-installed rows. Chosen so the invariant-based
#: expanded-mask reconstruction (tree_t) marks nothing expanded there.
NBP_PRISTINE = 3.0e38


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
    # Tie-breaking noise amplitude, added to each node's stored prior row at
    # installation (0 disables). The reference randomizes tie order by
    # shuffling the children list once per expansion (MCTS.pyx:76-79);
    # per-expansion prior noise reproduces that — a fixed random tie order
    # per node — while keeping the walk free of per-sim [A]-noise draws.
    tie_noise: float = 1e-6

    @property
    def value_size(self) -> int:
        return self.num_players + int(self.has_draw)


@struct.dataclass
class Tree:
    """Fixed-capacity search tree for ONE game (batch via vmap).

    Node 0 is the root; node slots are allocated in visit order from
    ``next_free``. Per-node stats mirror the reference Node fields
    (MCTS.pyx:49-71): ``n``/``q``/``v``/``prior``/``player``/``e``.
    There is NO stored child-pointer array: edges are derived on the fly
    from ``parent``/``parent_action`` (see :func:`child_row`).

    Row arrays are flat (see module docstring): element (node, a) of
    ``valids``/``prior`` lives at index ``node * num_actions + a``; node
    ``i``'s terminal vector is ``e[i*value_size : (i+1)*value_size]``; each
    ``node_state`` leaf of per-node size S is ``[rows * S]``.
    """

    # Env state snapshot per node (stacked, flattened pytree) — replaces the
    # reference's re-cloning of GameState along the path (MCTS.pyx:211-217).
    node_state: object
    parent: jnp.ndarray  # int32[N]
    parent_action: jnp.ndarray  # int32[N]
    valids: jnp.ndarray  # bool[N*A]
    prior: jnp.ndarray  # float32[N*A] — packed: INVALID_PRIOR where invalid
    n: jnp.ndarray  # int32[N] visit counts
    q: jnp.ndarray  # float32[N] mean backed-up value (parent's perspective)
    v: jnp.ndarray  # float32[N] first-visit net value (own perspective)
    e: jnp.ndarray  # float32[N*value_size] terminal win vectors
    player: jnp.ndarray  # int32[N] player to move at the node
    # prior[parent, parent_action] captured at allocation time — the edge's
    # own prior as a per-NODE column. Lets the walk compute every visited
    # child's PUCT term and the FPU seen-policy as pure column math (one
    # [A, N] masked reduce per step instead of four); see _child_scores.
    edge_prior: jnp.ndarray  # float32[N]
    # Per-node bitmask of actions whose child edge has been allocated,
    # packed 32 actions per word (flat [N * ceil(A/32)] uint32). Lets the
    # walk score the best UNVISITED action with pure [A] column math — the
    # O(A*N) per-step compare-reduce that previously overlaid visited-child
    # scores onto the action axis is gone (children score in [N] space).
    expanded: jnp.ndarray  # uint32[N*W32]
    # Rank-walk columns: per node, the best VALID UNexpanded action (the one
    # the walk's unexpanded arm would pick) and its stored prior. Because the
    # unexpanded arm always picks the argmax-prior action (fpu/sqrt_n are
    # constant across actions at a node), actions expand in strictly
    # descending (prior, -index) order — so ONE next-best pointer per node,
    # advanced with a single row pass per expansion (see _next_best), spares
    # the walk every per-step [A]-row read. This is what makes the Pallas
    # descent kernel's footprint independent of action-space size
    # (ops/descend.py; the loops beaten: MCTS.pyx:86-104 over children).
    nba: jnp.ndarray  # int32[N] — next best unexpanded action id
    nbp: jnp.ndarray  # float32[N] — its prior; NBP_NONE/NBP_PRISTINE sentinels
    next_free: jnp.ndarray  # int32 scalar — next unallocated slot
    depth: jnp.ndarray  # int32 scalar — depth of last find_leaf
    max_depth: jnp.ndarray  # int32 scalar — max depth this search
    leaf: jnp.ndarray  # int32 scalar — node index of the pending leaf
    num_actions: int = struct.field(pytree_node=False, default=0)
    value_size: int = struct.field(pytree_node=False, default=3)

    @property
    def capacity(self) -> int:
        """Usable node slots (one extra dummy write-sink row exists)."""
        return self.parent.shape[0] - 1

    @property
    def dummy(self) -> int:
        return self.parent.shape[0] - 1

    @property
    def action_size(self) -> int:
        return self.num_actions


#: Row arrays whose row size reaches a TPU lane tile keep the plain 2-D
#: [rows, size] shape: their tile padding is negligible (e.g. tafl's A=2420
#: pads to 2432) and flat<->2-D reshape views of big buffers materialize as
#: full relayout copies per sim (profiled: 4x ~318 ms reshapes per 100 tafl
#: sims). Sub-tile rows (connect4's A=7, board snapshots, win vectors) are
#: flattened, where the padding would otherwise blow the buffer up 18x.
_FLAT_MAX_ROW_SIZE = 128


def _alloc_rows(rows: int, size: int, dtype, fill=0) -> jnp.ndarray:
    shape = (rows * size,) if size < _FLAT_MAX_ROW_SIZE else (rows, size)
    return jnp.full(shape, fill, dtype)


def _words32(num_actions: int) -> int:
    """Words per node row of the packed expanded-action bitmask."""
    return (num_actions + 31) // 32


def _expand_bits(row: jnp.ndarray, num_actions: int) -> jnp.ndarray:
    """Unpack a [..., W32] uint32 bitmask row to [..., A] bool — pure
    broadcast/shift ops, no gathers."""
    W32 = row.shape[-1]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (row[..., :, None] >> shifts) & jnp.uint32(1)  # [..., W32, 32]
    return bits.reshape(row.shape[:-1] + (W32 * 32,))[..., :num_actions] > 0


def _size_of(template_leaf) -> int:
    return int(np.prod(jnp.shape(template_leaf), dtype=np.int64)) or 1


def _row(buf: jnp.ndarray, idx, size: int) -> jnp.ndarray:
    """Slice row ``idx`` out of a flat row array.

    Expressed as a leading-axis take on a reshaped 2-D view — NOT as
    ``dynamic_slice`` at offset ``idx*size``: XLA lowers vmapped
    arbitrary-offset window gathers to a serial per-game loop on TPU
    (measured 8x end-to-end regression), while whole-row takes hit the fast
    gather path. The reshape stays inside the surrounding fusion; only the
    carried flat buffer is materialized.
    """
    if buf.ndim == 2:
        return buf[idx]
    return buf.reshape(-1, size)[idx]


#: Row writes on buffers at or below this element count use a dense one-hot
#: select instead of a scatter. Scatters of sub-tile rows into small tiled
#: buffers lower to read-modify-write tile loops plus a layout copy of the
#: whole buffer per sim (profiled: the three `copy_bitcast_fusion` ops that
#: dominated the non-net time); a dense select is one fused vector pass. For
#: large-action or deep arenas (tafl/chess: N*A ~ 600k) the dense pass would
#: read megabytes per game per sim, so big buffers keep the row scatter.
_DENSE_SET_MAX_ELEMS = 16384


def _set_row(buf: jnp.ndarray, idx, row: jnp.ndarray) -> jnp.ndarray:
    if buf.ndim == 2:  # big rows: plain scatter, no reshape
        return buf.at[idx].set(row)
    size = row.shape[0]
    rows = buf.shape[0] // size
    b2 = buf.reshape(rows, size)
    if buf.shape[0] <= _DENSE_SET_MAX_ELEMS:
        onehot = (jax.lax.iota(jnp.int32, rows) == idx)[:, None]
        return jnp.where(onehot, row[None, :].astype(buf.dtype),
                         b2).reshape(buf.shape)
    return b2.at[idx].set(row).reshape(buf.shape)


def _set_row_uniform(buf: jnp.ndarray, idx, row: jnp.ndarray) -> jnp.ndarray:
    """Row write at an index that is UNIFORM across the vmapped batch.

    Per-game row scatters are poison at scale: the scatter's preferred
    layout differs from the row-read gathers', costing a whole-buffer layout
    copy per simulation (measured 1.6 ms per 0.5 GB buffer at tafl scale).
    With a uniform index:

    * big 2-D row buffers: read-modify-write an 8-row-ALIGNED window via
      dynamic-slice + dynamic-update-slice (vmap keeps them DUS when the
      start is unbatched) — in-place, layout-neutral, touches 8 rows instead
      of the whole buffer (the full-buffer dense select costs ~1.3 ms/sim at
      tafl scale; the window ~0.3 ms);
    * small flat buffers: one fused dense select pass.
    """
    row = row.astype(buf.dtype)
    if buf.ndim == 2:
        rows = buf.shape[0]
        if rows < 8:  # tiny arenas: window cannot fit, dense is free anyway
            onehot = (jax.lax.iota(jnp.int32, rows) == idx)[:, None]
            return jnp.where(onehot, row[None, :], buf)
        base = jnp.minimum((idx // 8) * 8, rows - 8)
        win = jax.lax.dynamic_slice(buf, (base, jnp.int32(0)),
                                    (8, buf.shape[1]))
        sub = (jax.lax.iota(jnp.int32, 8) == idx - base)[:, None]
        win = jnp.where(sub, row[None, :], win)
        return jax.lax.dynamic_update_slice(buf, win, (base, jnp.int32(0)))
    size = row.shape[0]
    rows = buf.shape[0] // size
    onehot = (jax.lax.iota(jnp.int32, rows) == idx)[:, None]
    return jnp.where(onehot, row[None, :],
                     buf.reshape(rows, size)).reshape(buf.shape)


def _scatter_state_uniform(tree_node_state, state, idx):
    return jax.tree_util.tree_map(
        lambda buf, x: _set_row_uniform(buf, idx, jnp.ravel(x)),
        tree_node_state, state,
    )


def gather_state(env, tree: Tree, idx):
    """Reconstruct the env-state pytree stored at node ``idx``."""
    template = env.init()
    return jax.tree_util.tree_map(
        lambda buf, t: _row(buf, idx, _size_of(t)).reshape(jnp.shape(t)),
        tree.node_state, template,
    )


def _scatter_state(tree_node_state, state, idx):
    return jax.tree_util.tree_map(
        lambda buf, x: _set_row(buf, idx, jnp.ravel(x)),
        tree_node_state, state,
    )


def init_tree(env, root_state, capacity: int, value_size: int) -> Tree:
    """Create an empty tree rooted at ``root_state``.

    Replaces MCTS.reset / fresh-MCTS-per-game (MCTS.pyx:154-160). One extra
    row beyond ``capacity`` is allocated as a write sink (the "dummy slot"):
    conditional node writes always execute as single-row scatters targeting
    either a real slot or the sink, which keeps every tree array out of
    vmapped cond/select paths (a full-tree select per while-loop iteration is
    what makes the naive formulation memory-bound).
    """
    A = env.ACTION_SIZE
    rows = capacity + 1  # last row is the dummy write sink
    node_state = jax.tree_util.tree_map(
        lambda x: _alloc_rows(rows, _size_of(x), jnp.asarray(x).dtype),
        root_state,
    )
    node_state = _scatter_state(node_state, root_state, 0)
    return Tree(
        node_state=node_state,
        parent=jnp.full((rows,), UNVISITED, jnp.int32),
        parent_action=jnp.full((rows,), UNVISITED, jnp.int32),
        valids=_alloc_rows(rows, A, jnp.bool_, False),
        prior=_alloc_rows(rows, A, jnp.float32),
        n=jnp.zeros((rows,), jnp.int32),
        q=jnp.zeros((rows,), jnp.float32),
        v=jnp.zeros((rows,), jnp.float32),
        e=_alloc_rows(rows, value_size, jnp.float32),
        player=jnp.zeros((rows,), jnp.int32),
        edge_prior=jnp.zeros((rows,), jnp.float32),
        expanded=_alloc_rows(rows, _words32(A), jnp.uint32),
        nba=jnp.zeros((rows,), jnp.int32),
        nbp=jnp.full((rows,), NBP_PRISTINE, jnp.float32),
        next_free=jnp.int32(1),
        depth=jnp.int32(0),
        max_depth=jnp.int32(0),
        leaf=ROOT,
        num_actions=A,
        value_size=value_size,
    )


def _get_value(value_vec: jnp.ndarray, player: jnp.ndarray, spec: SearchSpec):
    """Per-player value with draw credit (MCTS.pyx:291-295)."""
    v = value_vec[player]
    if spec.has_draw:
        v = v + value_vec[spec.num_players] / spec.num_players
    return v


def child_row(tree: Tree, node: jnp.ndarray):
    """Derive (child_idx [A], child_n [A], child_q [A]) at ``node`` from the
    parent/parent_action columns.

    There is no stored child-pointer array: the edge ``(node, a) -> c`` is
    recovered as "the node ``c`` with ``parent[c] == node`` and
    ``parent_action[c] == a``" via one fused [A, N] compare-reduce over the
    (small) node axis. This removes the O(N*A) children buffer — at tafl
    scale a 0.5 GB array whose per-sim single-element scatter forced a
    whole-buffer layout copy each simulation — and is also how child n/q
    stats are read: fancy indexing (``n[idx]``) inside a vmapped while_loop
    lowers to a scalar-path gather fusion (~100 ns/element — measured
    12.6 ms per walk step at B=512, A=2420), while the one-hot reduction
    stays a fused VPU pass.

    The dummy write-sink row (last) is excluded: masked scatters park junk
    parent/parent_action values there, which must never manufacture an edge.
    """
    parent = tree.parent[:-1]  # [N-1] — exclude the dummy sink
    pa = tree.parent_action[:-1]
    iota_a = jax.lax.iota(jnp.int32, tree.num_actions)[:, None]
    iota_n = jax.lax.iota(jnp.int32, parent.shape[0])[None, :]
    onehot = (parent[None, :] == node) & (pa[None, :] == iota_a)  # [A, N-1]
    exists = jnp.any(onehot, axis=1)
    child_idx = jnp.where(
        exists, jnp.sum(jnp.where(onehot, iota_n, 0), axis=1), UNVISITED
    ).astype(jnp.int32)
    child_n = jnp.sum(jnp.where(onehot, tree.n[None, :-1], 0), axis=1)
    child_q = jnp.sum(jnp.where(onehot, tree.q[None, :-1], 0.0), axis=1)
    return child_idx, child_n, child_q


def descend(tree: Tree, spec: SearchSpec):
    """Read-only PUCT walk from the root (MCTS.pyx:208-217) for ONE game.

    Per step the candidates split into two sets scored WITHOUT any [A, N]
    cross-term (the expanded-action bitmask keeps them disjoint):

      * visited children — ``q[c] + cpuct * edge_prior[c] * sqrt_n /
        (1 + n[c])`` — pure [N] column math over parent links;
      * unexpanded valid actions — ``fpu + cpuct * p[a] * sqrt_n`` over the
        node's stored prior row masked by ``~expanded`` — pure [A] math.
        (MCTS.pyx:86-87: value term is fpu for n == 0, q otherwise.)

    The max of the two argmaxes is the reference's best_child. Random tie
    order comes from the per-expansion prior noise (SearchSpec.tie_noise),
    so the walk draws no RNG at all. Previous formulations overlaid child
    scores onto the action axis with an O(A*N) masked compare-reduce per
    step — at hnefatafl scale (A=2420) that was ~2/3 of all search time.

    Returns (node, action, child, depth, skip_walk, p_sel): ``node`` is the
    leaf's parent when a new edge must be allocated (child == UNVISITED) or
    the terminal child itself; ``p_sel`` is the chosen edge's prior
    (``prior[node, action]``) — the caller stores it as the new node's
    ``edge_prior``. Env-agnostic, few-scalar carry so vmapping costs scalar
    selects, not tree copies. The batched Pallas twin lives in ops/descend.py.
    """
    A = tree.num_actions
    W32 = _words32(A)
    V = tree.value_size
    eany = jnp.any(tree.e.reshape(-1, V) > 0, axis=1)  # [N] terminal flags
    root_unexpanded = tree.n[ROOT] == 0
    skip_walk = root_unexpanded | eany[ROOT]

    parent = tree.parent[:-1]  # [N-1] — exclude the dummy sink
    pa = tree.parent_action[:-1]
    ep = tree.edge_prior[:-1]
    nf = tree.n[:-1].astype(jnp.float32)
    qc = tree.q[:-1]
    eany_c = eany[:-1]
    iota_n = jax.lax.iota(jnp.int32, parent.shape[0])

    def cond(carry):
        _node, _action, _child, _depth, done, _p = carry
        return ~done

    def body(carry):
        node, _action, _child, depth, _done, _p = carry
        is_child = parent == node  # allocated children always have n > 0
        seen_policy = jnp.sum(jnp.where(is_child, ep, 0.0))
        fpu_value = tree.v[node] - spec.fpu_reduction * jnp.sqrt(seen_policy)
        sqrt_n = jnp.sqrt(tree.n[node].astype(jnp.float32))

        # Visited children, in node space (MCTS.pyx:86-87 n>0 branch).
        score_c = qc + spec.cpuct * ep * sqrt_n / (1.0 + nf)
        score_c = jnp.where(is_child, score_c, -jnp.inf)
        c_star = jnp.argmax(score_c).astype(jnp.int32)
        best_c = jnp.max(score_c)
        sel_c = iota_n == c_star  # scalar reads via [N] one-hot sums —
        a_c = jnp.sum(jnp.where(sel_c, pa, 0))      # fancy scalar gathers
        ep_c = jnp.sum(jnp.where(sel_c, ep, 0.0))   # lower to slow paths
        # Stop at terminal children AND at PENDING children (allocated but
        # not yet backed up, n == 0 — only possible under multi-leaf rounds,
        # search.py; sequential search backs every allocation up before the
        # next walk, so this clause is inert at leaf_batch=1).
        term_c = jnp.any(sel_c & (eany_c | (nf == 0)))

        # Best unexpanded valid action, in action space. Picked by RAW prior
        # (then scored once): u = fpu + cpuct*p*sqrt_n is monotonic in p, so
        # argmax(p) == argmax(u) mathematically — but computing the affine u
        # per action in f32 rounds away tie-noise-sized prior differences
        # and manufactures ties that the rank-walk pointer (Tree.nba) never
        # sees. The raw-prior pick keeps this walk bit-aligned with the
        # pointer (and is closer to the reference's C-double uct,
        # MCTS.pyx:86-87, than an f32-rounded affine would be).
        pv = _row(tree.prior, node, A)  # packed prior/valid row
        xrow = _row(tree.expanded, node, W32)
        valid_u = (pv >= 0.0) & ~_expand_bits(xrow, A)
        pv_m = jnp.where(valid_u, pv, -jnp.inf)
        a_u = jnp.argmax(pv_m).astype(jnp.int32)
        pv_u = jnp.max(pv_m)
        has_u = pv_u >= 0.0
        best_u = jnp.where(has_u,
                           fpu_value + spec.cpuct * pv_u * sqrt_n, -jnp.inf)
        pv_u = jnp.where(has_u, pv_u, 0.0)

        child_wins = best_c > best_u  # exact tie → unexpanded action
        action = jnp.where(child_wins, a_c, a_u).astype(jnp.int32)
        child = jnp.where(child_wins, c_star, UNVISITED).astype(jnp.int32)
        p_sel = jnp.where(child_wins, ep_c, pv_u)
        # Stop at an unallocated edge or a terminal child (MCTS.pyx:213).
        done = jnp.where(child_wins, term_c, True)
        next_node = jnp.where(child_wins, c_star, node)
        return next_node, action, child, depth + 1, done, p_sel

    node, action, child, depth, _, p_sel = jax.lax.while_loop(
        cond, body,
        (ROOT, jnp.int32(0), jnp.int32(UNVISITED), jnp.int32(0), skip_walk,
         jnp.float32(0.0)),
    )
    depth = jnp.where(skip_walk, 0, depth)
    return node, action, child, depth, skip_walk, p_sel


def _set_expanded_bit(expanded: jnp.ndarray, node, action, active,
                      num_actions: int) -> jnp.ndarray:
    """Set bit (node, action) of the packed expanded mask where ``active`` —
    one fused one-hot select pass (no scatter; O(N*W32) elements ≈ A/32 of
    one walk-step's former cost, once per sim). Handles both row-array
    layouts (flat [N*W32] and 2-D [N, W32] — see _alloc_rows).
    """
    W32 = _words32(num_actions)
    action = action.astype(jnp.uint32)
    word = (action >> 5).astype(jnp.int32)
    bit = jnp.uint32(1) << (action & jnp.uint32(31))
    if expanded.ndim == 2:
        onehot = ((jax.lax.iota(jnp.int32, expanded.shape[0])[:, None]
                   == node)
                  & (jax.lax.iota(jnp.int32, W32)[None, :] == word))
    else:
        onehot = jax.lax.iota(jnp.int32, expanded.shape[0]) \
            == node * W32 + word
    return jnp.where(onehot & active, expanded | bit, expanded)


def _next_best(prior_row: jnp.ndarray, p_star=None, a_star=None):
    """(action, prior) of the best valid action strictly BELOW ``(p_star,
    a_star)`` in descending-(prior, -index) order — the rank-walk pointer
    advance. With ``p_star=None``, the unrestricted best (fresh-row init).

    The tie order ((p, -index), i.e. equal priors break toward the LOWER
    index) matches ``jnp.argmax``'s first-max rule exactly, so the pointer
    tracks the XLA walk's picks even at exactly tied priors (tie_noise=0).
    Invalid actions store INVALID_PRIOR < 0 and are excluded by the >= 0
    test. Returns (int32 action, float32 prior-or-NBP_NONE). Broadcasts over
    leading batch axes.
    """
    A = prior_row.shape[-1]
    mask = prior_row >= 0.0
    if p_star is not None:
        iota_a = jnp.arange(A, dtype=jnp.int32)
        below = (prior_row < p_star[..., None]) | (
            (prior_row == p_star[..., None]) & (iota_a > a_star[..., None]))
        mask = mask & below
    vals = jnp.where(mask, prior_row, NBP_NONE)
    a = jnp.argmax(vals, axis=-1).astype(jnp.int32)
    p = jnp.max(vals, axis=-1)
    return a, p


def _win_valids(env, state):
    """(win_state, valid_moves) of one state — via the env's fused
    ``win_and_valids`` when provided (e.g. tafl computes its board-only
    movegen masks once for both; separately they run the movegen 3x)."""
    fn = getattr(env, "win_and_valids", None)
    if fn is not None:
        return fn(state)
    return env.win_state(state), env.valid_moves(state)


def apply_walk(env, tree: Tree, node, action, child, depth, skip_walk,
               p_sel=None, uniform_slot=None) -> Tree:
    """Allocate/expand the walk's leaf (MCTS.pyx:218-228) — the write half of
    find_leaf.

    Two write strategies:

    * ``uniform_slot=None`` (general): masked single-row scatters routed to
      the dummy sink when inactive, slot = per-game ``next_free``. Correct
      for any tree (including reused/rerooted trees whose allocation fronts
      diverge across games).
    * ``uniform_slot`` given (a traced scalar, the SAME for every game in
      the vmapped batch — valid for fresh-tree searches where simulation k
      can only ever allocate slot k): all big-row writes (state snapshot,
      valids, terminal vector) go to ``uniform_slot`` UNCONDITIONALLY —
      games that allocated get real data; games whose walk ended at a
      terminal node leave junk in an unreferenced slot (its parent stays
      UNVISITED, so no derived edge can reach it). Uniform-index writes
      lower as dynamic-update-slices, avoiding the per-game scatter whose
      layout preferences force whole-buffer copies each simulation.
    """
    DUMMY = jnp.int32(tree.dummy)
    if p_sel is None:
        p_sel = jnp.float32(0.0)

    need_alloc = (child == UNVISITED) & ~skip_walk
    parent_state = gather_state(env, tree, node)
    child_state = env.step(parent_state, action)

    if uniform_slot is None:
        # ---- allocation (masked single-row scatters) -----------------------
        slot = jnp.where(need_alloc, tree.next_free, DUMMY)
        node_state = _scatter_state(tree.node_state, child_state, slot)
        # Advance the parent's rank-walk pointer past the action just
        # expanded (one row pass; see _next_best / Tree.nba).
        nb_a, nb_p = _next_best(_row(tree.prior, node, tree.num_actions),
                                p_sel, action)
        upd = jnp.where(need_alloc, node, DUMMY)
        # No child-pointer array exists: writing (parent, parent_action) at
        # the new slot IS the edge insertion (see child_row).
        tree = tree.replace(
            node_state=node_state,
            parent=tree.parent.at[slot].set(node),
            parent_action=tree.parent_action.at[slot].set(action),
            edge_prior=tree.edge_prior.at[slot].set(p_sel),
            expanded=_set_expanded_bit(tree.expanded, node, action,
                                       need_alloc, tree.num_actions),
            nba=tree.nba.at[upd].set(nb_a),
            nbp=tree.nbp.at[upd].set(nb_p),
            next_free=tree.next_free + need_alloc.astype(jnp.int32),
        )
        leaf = jnp.where(skip_walk, ROOT, jnp.where(need_alloc, slot, child))
        max_depth = jnp.maximum(tree.max_depth, depth)
        tree = tree.replace(depth=depth, max_depth=max_depth, leaf=leaf)

        # ---- expansion: player / terminal / valids (MCTS.pyx:223-226) ------
        leaf_state = gather_state(env, tree, leaf)
        expand_row = jnp.where(tree.n[leaf] == 0, leaf, DUMMY)
        win_vec, valid_vec = _win_valids(env, leaf_state)
        return tree.replace(
            player=tree.player.at[expand_row].set(leaf_state.player),
            e=_set_row(tree.e, expand_row, win_vec),
            valids=_set_row(tree.valids, expand_row, valid_vec),
        )

    # ---- uniform-slot mode -------------------------------------------------
    tree, _obs, _e, _valids = _apply_walk_uniform(
        env, tree, node, action, child, depth, skip_walk, need_alloc,
        child_state, uniform_slot, p_sel,
    )
    return tree


def _apply_walk_uniform(env, tree, node, action, child, depth, skip_walk,
                        need_alloc, child_state, uniform_slot, p_sel,
                        multi_leaf: bool = False):
    DUMMY = jnp.int32(tree.dummy)
    slot = jnp.asarray(uniform_slot, jnp.int32)
    alloc_row = jnp.where(need_alloc, slot, DUMMY)
    win_vec, valid_vec = _win_valids(env, child_state)
    # Advance the parent's rank-walk pointer (see _next_best / Tree.nba).
    nb_a, nb_p = _next_best(_row(tree.prior, node, tree.num_actions),
                            p_sel, action)
    upd = jnp.where(need_alloc, node, DUMMY)
    tree = tree.replace(
        node_state=_scatter_state_uniform(tree.node_state, child_state, slot),
        parent=tree.parent.at[alloc_row].set(node),
        parent_action=tree.parent_action.at[alloc_row].set(action),
        expanded=_set_expanded_bit(tree.expanded, node, action, need_alloc,
                                   tree.num_actions),
        nba=tree.nba.at[upd].set(nb_a),
        nbp=tree.nbp.at[upd].set(nb_p),
        # Unconditional at the uniform slot: non-allocating games leave junk
        # there, unreachable because their parent row stays UNVISITED.
        edge_prior=tree.edge_prior.at[slot].set(p_sel),
        # Junk slots (games that did not allocate) stay within the bound but
        # are unreachable (parent UNVISITED); the bound preserves the
        # rows-beyond-are-pristine invariant reroot depends on.
        next_free=slot + 1,
    )
    leaf = jnp.where(skip_walk, ROOT, jnp.where(need_alloc, slot, child))
    max_depth = jnp.maximum(tree.max_depth, depth)
    # Expansion data is the freshly stepped child state — when the leaf is
    # NOT the new slot (terminal revisit) the leaf is already expanded and
    # the uniform write lands in the junk slot.
    tree = tree.replace(
        depth=depth, max_depth=max_depth, leaf=leaf,
        player=tree.player.at[slot].set(child_state.player),
        e=_set_row_uniform(tree.e, slot, win_vec),
        valids=_set_row_uniform(tree.valids, slot, valid_vec),
    )
    # Leaf observation / valids come straight from the stepped state — no
    # second node_state gather (the observation is dead when the leaf is
    # terminal, and a terminal leaf's prior row is never read).
    #
    # The leaf's TERMINAL VECTOR must come from the STORED e row, not from
    # the stepped state: when the walk stops at an already-terminal child,
    # ``child_state = step(state[child], action)`` re-steps a finished
    # game, which can change the winner (e.g. the losing side completing a
    # line on a won connect4 board). Read it as a one-hot contraction at
    # ``leaf`` over the just-updated e (covers all three leaf cases: new
    # slot — row just written with win_vec; terminal revisit — stored row;
    # terminal root under skip_walk — row 0). Fancy-indexed row gathers are
    # banned here (scalar-path lowering, ~0.4 ms/sim at B=2048); the masked
    # reduce is one fused pass.
    V = tree.value_size
    rows = tree.parent.shape[0]
    sel = (jax.lax.iota(jnp.int32, rows) == leaf)[:, None]
    e_leaf = jnp.sum(jnp.where(sel, tree.e.reshape(rows, V), 0.0), axis=0)
    if multi_leaf:
        # Pending-leaf stops (multi-leaf rounds, search.py) make the stepped
        # state garbage while its observation is still consumed — rebuild
        # obs/valids from the stored leaf row.
        leaf_state = gather_state(env, tree, leaf)
        return (tree, env.observation(leaf_state), e_leaf,
                env.valid_moves(leaf_state))
    return tree, env.observation(child_state), e_leaf, valid_vec


def apply_walk_observe(env, tree: Tree, node, action, child, depth, skip_walk,
                       p_sel, uniform_slot, multi_leaf: bool = False):
    """Uniform-slot apply_walk that also returns the leaf's observation,
    terminal vector, and valid-move mask (see _apply_walk_uniform;
    ``multi_leaf`` as in tree_t.apply_walk_observe_t)."""
    need_alloc = (child == UNVISITED) & ~skip_walk
    parent_state = gather_state(env, tree, node)
    child_state = env.step(parent_state, action)
    return _apply_walk_uniform(env, tree, node, action, child, depth,
                               skip_walk, need_alloc, child_state,
                               uniform_slot, p_sel, multi_leaf=multi_leaf)


def expand_root(env, tree: Tree):
    """First simulation on a FRESH tree: every game's leaf is the root and no
    allocation can occur, so expansion writes go to the static root row (no
    scatter at all). Replaces apply_walk for that one simulation.

    Returns (tree, observation, e_leaf, leaf_valids) like
    :func:`apply_walk_observe`."""
    root_state = gather_state(env, tree, ROOT)
    win_vec, valid_vec = _win_valids(env, root_state)
    tree = tree.replace(
        depth=jnp.int32(0),
        leaf=jnp.int32(ROOT),
        player=tree.player.at[0].set(root_state.player),
        e=_set_row_uniform(tree.e, jnp.int32(0), win_vec),
        valids=_set_row_uniform(tree.valids, jnp.int32(0), valid_vec),
    )
    return tree, env.observation(root_state), win_vec, valid_vec


def find_leaf(env, tree: Tree, spec: SearchSpec,
              rng: jnp.ndarray = None) -> Tree:
    """Walk + allocate + expand for ONE game (MCTS.pyx:208-228): the tree is
    returned with ``tree.leaf`` set; the caller evaluates the leaf observation
    and calls :func:`process_results`.

    The walk itself is deterministic — random tie order is fixed per node
    by the prior noise installed at expansion (the reference shuffles
    children at expansion, MCTS.pyx:78-79). ``rng`` is accepted and ignored
    for API stability.
    """
    del rng
    node, action, child, depth, skip_walk, p_sel = descend(tree, spec)
    return apply_walk(env, tree, node, action, child, depth, skip_walk, p_sel)


def leaf_observation(env, tree: Tree) -> jnp.ndarray:
    return env.observation(gather_state(env, tree, tree.leaf))


def resolve_value(tree: Tree, value: jnp.ndarray) -> jnp.ndarray:
    """Terminal leaves back up their stored result instead of the network
    value (MCTS.pyx:234-235)."""
    e_leaf = _row(tree.e, tree.leaf, tree.value_size)
    is_terminal = jnp.any(e_leaf > 0)
    return jnp.where(is_terminal, e_leaf, value)


def install_prior(tree: Tree, pi: jnp.ndarray, spec: SearchSpec,
                  rng: jnp.ndarray,
                  add_root_noise: bool | jnp.ndarray = None,
                  add_root_temp: bool | jnp.ndarray = None,
                  root_adjust: bool = True, uniform_slot=None,
                  leaf_valids: jnp.ndarray | None = None) -> Tree:
    """Mask/renormalize the policy against the leaf's valid moves and store
    it, with root temperature/Dirichlet noise when the leaf is the root
    (MCTS.pyx:236-258).

    ``root_adjust=False`` (static) removes the root-temperature/Dirichlet
    trace entirely — callers use it for every simulation after the first
    (with a fresh tree per move, only the first simulation can have the root
    as its leaf, MCTS.pyx:247-256).

    ``uniform_slot`` (see apply_walk): the prior row is written to that slot
    unconditionally as a dynamic-update-slice — a terminal leaf's prior row
    is never read (walks stop at terminal nodes), and a non-allocating
    game's write lands in its unreachable junk slot.

    ``leaf_valids``: the leaf's valid-move mask if the caller already has it
    (apply_walk_observe/expand_root return it) — avoids a per-game dynamic
    row gather on the flat valids buffer (~0.15 ms/sim at B=2048).
    """
    if add_root_noise is None:
        add_root_noise = spec.add_root_noise
    if add_root_temp is None:
        add_root_temp = spec.add_root_temp
    leaf = tree.leaf
    A = tree.num_actions
    DUMMY = jnp.int32(tree.dummy)
    rng, rng_tie = jax.random.split(rng)

    valids = (leaf_valids if leaf_valids is not None
              else _row(tree.valids, leaf, A))
    masked = jnp.where(valids, pi, 0.0)
    norm = jnp.sum(masked)
    masked = jnp.where(norm > 0, masked / norm,
                       valids.astype(jnp.float32) /
                       jnp.maximum(jnp.sum(valids), 1))

    if root_adjust:
        is_root = leaf == ROOT

        def with_root_adjust(p):
            # Root temperature (MCTS.pyx:247-252).
            temped = jnp.where(
                jnp.asarray(add_root_temp),
                _renorm(jnp.where(valids,
                                  p ** (1.0 / spec.root_policy_temp), 0.0)),
                p,
            )
            # Dirichlet noise, alpha = NOISE_ALPHA_RATIO / num_valid
            # (MCTS.pyx:197-206). Sampled densely and masked to valid moves.
            num_valid = jnp.maximum(jnp.sum(valids), 1)
            alpha = NOISE_ALPHA_RATIO / num_valid.astype(jnp.float32)
            gam = jax.random.gamma(rng, alpha, (p.shape[0],))
            gam = jnp.where(valids, gam, 0.0)
            noise = gam / jnp.maximum(jnp.sum(gam), 1e-30)
            noised = (temped * (1 - spec.root_noise_frac)
                      + spec.root_noise_frac * noise)
            noised = jnp.where(valids, noised, 0.0)
            return jnp.where(jnp.asarray(add_root_noise), noised, temped)

        new_prior = jnp.where(is_root, with_root_adjust(masked), masked)
    else:
        new_prior = masked
    # Per-expansion tie noise: the reference shuffles the children list once
    # per expansion (MCTS.pyx:76-79); tiny additive prior noise fixes an
    # equivalent random tie order for this node for the whole search (and is
    # captured into edge_prior with the rest of the prior — the same noised
    # value scores the action before AND after its child is allocated).
    if spec.tie_noise:
        tie = jax.random.uniform(rng_tie, (A,)) * spec.tie_noise
        new_prior = jnp.where(valids, new_prior + tie, new_prior)
    # Pack the valid mask into the stored row (INVALID_PRIOR sentinel) so the
    # walk needs only this one row read per step.
    new_prior = jnp.where(valids, new_prior, jnp.float32(INVALID_PRIOR))
    # Fresh rank-walk pointer: the row's overall best valid action (no
    # children exist at install time; see _next_best / Tree.nba).
    nb_a, nb_p = _next_best(new_prior)
    if uniform_slot is not None:
        slot = jnp.asarray(uniform_slot, jnp.int32)
        return tree.replace(
            prior=_set_row_uniform(tree.prior, slot, new_prior),
            nba=tree.nba.at[slot].set(nb_a),
            nbp=tree.nbp.at[slot].set(nb_p),
        )
    is_terminal = jnp.any(_row(tree.e, leaf, tree.value_size) > 0)
    prior_row = jnp.where(is_terminal, DUMMY, leaf)
    return tree.replace(prior=_set_row(tree.prior, prior_row, new_prior),
                        nba=tree.nba.at[prior_row].set(nb_a),
                        nbp=tree.nbp.at[prior_row].set(nb_p))


def backup(tree: Tree, value: jnp.ndarray, spec: SearchSpec) -> Tree:
    """Back ``value`` (already terminal-resolved) up from ``tree.leaf`` to
    the root (MCTS.pyx:260-289). The loop carries only the n/q/v columns, so
    vmapping it never copies the big per-action arrays. The batched Pallas
    twin lives in ops/backup.py.
    """
    leaf = tree.leaf
    parent = tree.parent
    player = tree.player
    max_depth_f = jnp.maximum(tree.max_depth.astype(jnp.float32), 1.0)

    def cond(carry):
        _n, _q, _v, node, _i = carry
        return node != ROOT

    def body(carry):
        n_col, q_col, v_col, node, i = carry
        par = parent[node]
        val = _get_value(value, player[par], spec)
        frac = i.astype(jnp.float32) / max_depth_f
        discount = spec.min_discount ** frac
        discount = jnp.where(val < DRAW_VALUE, 2.0 - discount, discount)
        discount = jnp.where(val == DRAW_VALUE, 1.0, discount)

        n = n_col[node].astype(jnp.float32)
        new_q = (q_col[node] * n + val * discount) / (n + 1.0)
        own_v = _get_value(value, player[node], spec)
        new_v = jnp.where(n_col[node] == 0, own_v, v_col[node])
        return (
            n_col.at[node].add(1),
            q_col.at[node].set(new_q),
            v_col.at[node].set(new_v),
            par,
            i + 1,
        )

    n_col, q_col, v_col, _, _ = jax.lax.while_loop(
        cond, body, (tree.n, tree.q, tree.v, leaf, jnp.int32(0))
    )
    # Root visit increment (MCTS.pyx:289); also set root's own v on first
    # expansion so FPU at the root has a value to reduce from.
    root_v = jnp.where(
        n_col[ROOT] == 0, _get_value(value, player[ROOT], spec), v_col[ROOT]
    )
    n_col = n_col.at[ROOT].add(1)
    v_col = v_col.at[ROOT].set(root_v)
    return tree.replace(n=n_col, q=q_col, v=v_col)


def process_results(tree: Tree, value: jnp.ndarray, pi: jnp.ndarray,
                    spec: SearchSpec, rng: jnp.ndarray,
                    add_root_noise: bool | jnp.ndarray = None,
                    add_root_temp: bool | jnp.ndarray = None,
                    root_adjust: bool = True) -> Tree:
    """Install priors at the pending leaf and back the value up the path
    (MCTS.pyx:230-289) — prior installation + backup composed."""
    value = resolve_value(tree, value)
    tree = install_prior(tree, pi, spec, rng, add_root_noise, add_root_temp,
                         root_adjust=root_adjust)
    return backup(tree, value, spec)


def _renorm(p: jnp.ndarray) -> jnp.ndarray:
    return p / jnp.maximum(jnp.sum(p), 1e-30)


def slice_batched_rows(trees: Tree, n: int) -> Tree:
    """First ``n`` node rows of a BATCHED Tree ([B, ...] pytree).

    Fresh-tree uniform-slot searches touch only rows < hi during sims
    [lo, hi); slicing to ``n ≥ hi + 1`` rows shrinks every O(rows) pass of
    the walk/backup (growing-arena segmentation, search._segment_plan).
    Within the slice the sink row is index n-1; `_apply_walk_uniform` parks
    junk parent/parent_action there for non-allocating games, which
    :func:`merge_batched_rows` wipes back to UNVISITED before the slice
    rejoins the full arena.
    """
    full = trees.parent.shape[1]

    def cut(buf):
        if buf.ndim == 1:  # per-game scalars
            return buf
        if buf.ndim >= 3:  # [B, rows, size]
            return buf[:, :n]
        per = buf.shape[1] // full  # [B, rows*size] flat
        return buf[:, : n * per]

    return trees.replace(
        node_state=jax.tree_util.tree_map(cut, trees.node_state),
        parent=cut(trees.parent), parent_action=cut(trees.parent_action),
        valids=cut(trees.valids), prior=cut(trees.prior), n=cut(trees.n),
        q=cut(trees.q), v=cut(trees.v), e=cut(trees.e),
        player=cut(trees.player), edge_prior=cut(trees.edge_prior),
        expanded=cut(trees.expanded), nba=cut(trees.nba), nbp=cut(trees.nbp),
    )


def merge_batched_rows(full: Tree, part: Tree) -> Tree:
    """Write a searched slice back over the full batched arena, restoring
    the slice's sink row (n-1) to pristine UNVISITED (see
    :func:`slice_batched_rows`)."""
    n = part.parent.shape[1]
    part = part.replace(
        parent=part.parent.at[:, n - 1].set(UNVISITED),
        parent_action=part.parent_action.at[:, n - 1].set(UNVISITED),
    )

    def m(f, p):
        if p.ndim == 1:
            return p
        start = (jnp.int32(0),) * p.ndim
        return jax.lax.dynamic_update_slice(f, p.astype(f.dtype), start)

    return full.replace(
        node_state=jax.tree_util.tree_map(m, full.node_state,
                                          part.node_state),
        parent=m(full.parent, part.parent),
        parent_action=m(full.parent_action, part.parent_action),
        valids=m(full.valids, part.valids), prior=m(full.prior, part.prior),
        n=m(full.n, part.n), q=m(full.q, part.q), v=m(full.v, part.v),
        e=m(full.e, part.e), player=m(full.player, part.player),
        edge_prior=m(full.edge_prior, part.edge_prior),
        expanded=m(full.expanded, part.expanded),
        nba=m(full.nba, part.nba), nbp=m(full.nbp, part.nbp),
        next_free=part.next_free, depth=part.depth,
        max_depth=part.max_depth, leaf=part.leaf,
    )


def reroot(env, tree: Tree, action: jnp.ndarray) -> Tree:
    """Re-root the tree at the root's child for ``action`` — the array-tree
    equivalent of tree reuse via update_root (MCTS.pyx:185-195).

    The child's subtree is compacted to the front of a fresh arena (visit
    counts, priors and values preserved); if the edge was never expanded the
    result is an empty tree rooted at the stepped state. Membership is
    resolved by pointer-doubling over parent links (nodes are allocated
    parent-before-child, so ≤ log2(N) rounds suffice).

    Runs on 2-D ``[N, A]`` views of the flat row arrays — fine here (reroot is
    a per-move operation, not per-sim).
    """
    N = tree.parent.shape[0]  # rows incl. dummy
    A = tree.num_actions
    V = tree.value_size
    # The root's child for ``action``, derived from the parent links.
    is_child = ((tree.parent[:-1] == ROOT)
                & (tree.parent_action[:-1] == action)
                & (jnp.arange(N - 1) < tree.next_free))
    exists = jnp.any(is_child)
    safe_child = jnp.sum(
        jnp.where(is_child, jnp.arange(N - 1, dtype=jnp.int32), 0)
    )

    # --- subtree membership via ancestor jumping ---------------------------
    idx = jnp.arange(N, dtype=jnp.int32)
    member = idx == safe_child
    anc = jnp.where(idx == ROOT, jnp.int32(ROOT), tree.parent)
    anc = jnp.where(anc == UNVISITED, 0, anc)
    rounds = max(1, int(np.ceil(np.log2(max(N, 2)))))
    for _ in range(rounds):
        member = member | member[anc]
        anc = anc[anc]
    member = member & (idx < tree.next_free)  # ignore junk rows

    # --- compaction order: members keep their relative order ---------------
    new_pos = jnp.cumsum(member.astype(jnp.int32)) - 1  # [N]
    new_pos = jnp.where(member, new_pos, N - 1)  # non-members → dummy
    gather_idx = jnp.full((N,), N - 1, jnp.int32)
    gather_idx = gather_idx.at[new_pos].set(
        jnp.where(member, idx, N - 1)
    )

    def take_rows(buf, size):
        return buf.reshape(N, size)[gather_idx].reshape(buf.shape)

    count = jnp.sum(member).astype(jnp.int32)
    # Rows past the compacted subtree must be pristine: the gather fills them
    # from the dummy sink, whose parent/parent_action accumulate junk writes —
    # if later allocations reuse such a row un-cleared, the derived edges
    # could follow a garbage link into a self-loop.
    live_row = idx < count  # [N]

    def live(x, fill, size=1):
        if x.ndim == 2:
            mask = live_row[:, None]
        elif size == 1:
            mask = live_row
        else:
            mask = jnp.repeat(live_row, size)
        return jnp.where(mask, x, jnp.asarray(fill, x.dtype))

    node_state = jax.tree_util.tree_map(
        lambda buf: take_rows(buf, buf.size // N), tree.node_state
    )
    remap = lambda old: jnp.where(old == UNVISITED, UNVISITED, new_pos[
        jnp.where(old == UNVISITED, 0, old)
    ])
    parent = live(remap(tree.parent[gather_idx]), UNVISITED)
    parent = parent.at[ROOT].set(UNVISITED)
    compacted = Tree(
        node_state=node_state,
        parent=parent,
        parent_action=live(tree.parent_action[gather_idx], UNVISITED)
        .at[ROOT].set(UNVISITED),
        valids=live(take_rows(tree.valids, A), False, A),
        prior=live(take_rows(tree.prior, A), 0.0, A),
        n=live(tree.n[gather_idx], 0),
        q=live(tree.q[gather_idx], 0.0),
        v=live(tree.v[gather_idx], 0.0),
        e=live(take_rows(tree.e, V), 0.0, V),
        player=live(tree.player[gather_idx], 0),
        edge_prior=live(tree.edge_prior[gather_idx], 0.0).at[ROOT].set(0.0),
        expanded=live(take_rows(tree.expanded, _words32(A)), 0, _words32(A)),
        # Rank-walk pointers ride along unchanged: action ids do not remap
        # under compaction, and kept nodes keep their full children sets so
        # the descending-(prior, -index) expansion invariant is preserved.
        nba=live(tree.nba[gather_idx], 0),
        nbp=live(tree.nbp[gather_idx], NBP_PRISTINE),
        next_free=count,
        depth=jnp.int32(0),
        max_depth=jnp.int32(0),
        leaf=ROOT,
        num_actions=A,
        value_size=V,
    )

    # --- unexpanded edge → fresh tree at the stepped state -----------------
    root_state = gather_state(env, tree, ROOT)
    stepped = env.step(root_state, action)
    fresh = init_tree(env, stepped, N - 1, V)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            jnp.reshape(exists, (1,) * a.ndim), a, b
        ) if a.ndim else jnp.where(exists, a, b),
        compacted, fresh,
    )


# ---------------------------------------------------------------------------
# Root statistics (MCTS.pyx:297-344)
# ---------------------------------------------------------------------------

def _root_child_stats(tree: Tree):
    _idx, n, q = child_row(tree, ROOT)
    return n, q


def counts(tree: Tree) -> jnp.ndarray:
    return _root_child_stats(tree)[0]


def root_child_stats(tree: Tree):
    """Per-action root (visit counts, q values) — evaluator/GUI surface
    (reference: MCTS.pyx:297-344 counts/value readers)."""
    return _root_child_stats(tree)


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
    A = tree.num_actions
    root_n, root_q = _root_child_stats(tree)
    child_q = jnp.where(root_n > 0, root_q, 0.0)
    root_valids = tree.valids.reshape(-1, A)[0]
    if average:
        return jnp.sum(child_q) / jnp.maximum(jnp.sum(root_valids), 1)
    return jnp.max(child_q)
