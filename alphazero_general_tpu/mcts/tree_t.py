"""Game-minor (transposed) tree layout for the fresh-tree search scan.

The batch-major :class:`~alphazero_general_tpu.mcts.tree.Tree` layout
(``[B, ...]``, natural under ``vmap``) forces a layout inversion per
simulation wherever a Pallas kernel wants game-minor blocks ([N, A, B] /
[N, B] — games riding the 128-wide lane axis): the walk and backup kernels
each transposed their inputs (and backup its outputs) every simulation,
~25 MB of major-to-minor relayout traffic per sim at connect4 production
scale (B=2048).

``TreeT`` keeps every tree array **persistently game-minor across the whole
search**: the kernels consume the buffers directly, and — because the
fresh-tree uniform-slot discipline (see tree.apply_walk) makes every write
land at one batch-uniform row — all big-row writes become leading-axis
``dynamic_update_slice`` slabs of a few KB instead of per-game scatters or
whole-buffer selects. ``node_state`` is game-minor too, stored 3-D
([rows, S, B] per leaf) so the per-sim leaf-parent read is a one-hot
contraction with no reshape/relayout; env ``step``/``observation`` consume
it via ``vmap(in_axes=-1)``.

Semantics are byte-identical to the batch-major fresh-tree path: the same
per-game RNG draws (tiebreaks, Dirichlet keys), the same f32 math, the same
Pallas kernels. Conversion to/from ``Tree`` happens once per search
(amortized over ``sims`` simulations).

Reference mapping: this is still MCTS.pyx:208-289 (find_leaf /
process_results) — only the array layout differs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from alphazero_general_tpu.mcts import tree as T
from alphazero_general_tpu.mcts.tree import (
    ROOT, UNVISITED, SearchSpec, Tree, _renorm, _size_of,
    NOISE_ALPHA_RATIO,
)


@struct.dataclass
class TreeT:
    """Batched search tree in game-minor layout (batch axis LAST).

    Same fields/invariants as :class:`Tree` (see its docstring) plus a
    carried ``eany`` terminal-flag column (batch-major search recomputes it
    from ``e`` per sim; here it is maintained incrementally). ``node_state``
    is game-minor as well, 3-D ([rows, S, B] per leaf): the per-sim
    leaf-parent state read is a one-hot contraction over the node axis (see
    :func:`_gather_states`) — the XLA per-game row gather it replaces
    lowered to a scalar path costing ~0.19 ms/sim at B=2048, and a flat
    [rows*S, B] layout costs a tile-relayout copy per sim reshape.
    """

    node_state: object  # game-minor [rows, S, B] leaves (3-D: the per-sim
    # one-hot row contraction reads [N, S, B] directly — reshaping a flat
    # [rows*S, B] buffer per sim materializes a tile-relayout copy, measured
    # ~45% of all connect4 tree-op device time)
    parent: jnp.ndarray  # int32[N, B]
    parent_action: jnp.ndarray  # int32[N, B]
    # Big-row hybrid (``big_rows=True``, action spaces at/above the lane
    # tile — hnefatafl A=2420, chess A=4672): ``prior``/``valids`` keep the
    # batched Tree's BATCH-MAJOR [B, N, A] layout (per-game row gathers and
    # uniform-slot slab writes hit the fast paths there; a game-minor
    # [N*A, B] copy would also relayout gigabytes per conversion), and
    # ``expanded`` passes through UNMAINTAINED — the descent kernel reads
    # only the rank-walk pointers (tree.Tree.nba), and the bitmask is
    # reconstructed from the descending-(prior, -index) expansion invariant
    # at conversion back (see _reconstruct_expanded_big).
    valids: jnp.ndarray  # float32[N*A, B] (0/1) | bool[B, N, A] (big_rows)
    prior: jnp.ndarray  # float32[N*A, B] | float32[B, N, A] (big_rows)
    n: jnp.ndarray  # int32[N, B]
    q: jnp.ndarray  # float32[N, B]
    v: jnp.ndarray  # float32[N, B]
    e: jnp.ndarray  # float32[N*V, B]
    eany: jnp.ndarray  # float32[N, B] — 1.0 where the node is terminal
    player: jnp.ndarray  # int32[N, B]
    edge_prior: jnp.ndarray  # float32[N, B] — see tree.Tree.edge_prior
    expanded: jnp.ndarray  # uint32[N*W32, B] — or Tree layout (big_rows)
    nba: jnp.ndarray  # int32[N, B] — rank-walk pointer (tree.Tree.nba)
    nbp: jnp.ndarray  # float32[N, B] — rank-walk pointer prior
    next_free: jnp.ndarray  # int32[B]
    depth: jnp.ndarray  # int32[B]
    max_depth: jnp.ndarray  # int32[B]
    leaf: jnp.ndarray  # int32[B]
    num_actions: int = struct.field(pytree_node=False, default=0)
    value_size: int = struct.field(pytree_node=False, default=3)
    big_rows: bool = struct.field(pytree_node=False, default=False)


def tree_to_tree_t(trees: Tree) -> TreeT:
    """Vmapped batch-major Tree [B, ...] → game-minor TreeT.

    Requires flat node_state rows (every env state leaf below the lane
    tile). ``prior``/``valids`` may be flat (small A, transposed to
    game-minor) or big-row 3-D [B, N, A] (kept batch-major — the hybrid
    layout, see TreeT docstring).
    """
    assert all(b.ndim == 2 for b in jax.tree_util.tree_leaves(
        trees.node_state)), "TreeT requires flat node_state rows"
    big = trees.prior.ndim == 3
    B = trees.n.shape[0]
    N = trees.n.shape[1]
    V = trees.value_size
    t = lambda x: jnp.transpose(x, (1, 0))  # noqa: E731
    t3 = lambda x: t(x).reshape(N, x.shape[1] // N, B)  # noqa: E731
    eany = jnp.any(trees.e.reshape(B, N, V) > 0, axis=-1)
    return TreeT(
        node_state=jax.tree_util.tree_map(t3, trees.node_state),
        parent=t(trees.parent),
        parent_action=t(trees.parent_action),
        valids=(trees.valids if big
                else t(trees.valids.astype(jnp.float32))),
        prior=trees.prior if big else t(trees.prior),
        n=t(trees.n),
        q=t(trees.q),
        v=t(trees.v),
        e=t(trees.e),
        eany=t(eany.astype(jnp.float32)),
        player=t(trees.player),
        edge_prior=t(trees.edge_prior),
        expanded=trees.expanded if big else t(trees.expanded),
        nba=t(trees.nba),
        nbp=t(trees.nbp),
        next_free=trees.next_free,
        depth=trees.depth,
        max_depth=trees.max_depth,
        leaf=trees.leaf,
        num_actions=trees.num_actions,
        value_size=trees.value_size,
        big_rows=big,
    )


def _reconstruct_expanded_big(prior, nbp, nba, num_actions: int,
                              like: jnp.ndarray) -> jnp.ndarray:
    """Rebuild the packed expanded-action bitmask of a big-row TreeT from
    the rank-walk invariant: action ``a`` of node ``m`` is expanded iff its
    stored prior sits strictly ABOVE the node's pointer ``(nbp, nba)`` in
    descending-(prior, -index) order (see tree.Tree.nba — expansions happen
    exactly in that order, so the pointer partitions the row). Runs once per
    search at conversion, chunked over node rows to bound transients.

    ``like`` is the pass-through expanded buffer whose layout/shape the
    result must match ([B, N*W32] flat or [B, N, W32]).
    """
    B, N, A = prior.shape
    W32 = T._words32(A)
    Ap = W32 * 32
    shifts = jnp.arange(32, dtype=jnp.uint32)
    iota_a = jnp.arange(A, dtype=jnp.int32)
    nbp_b = jnp.transpose(nbp, (1, 0))  # [B, N]
    nba_b = jnp.transpose(nba, (1, 0))
    CH = 8
    outs = []
    for i in range(0, N, CH):
        rows = prior[:, i:i + CH]  # [B, c, A]
        p_star = nbp_b[:, i:i + CH][..., None]
        a_star = nba_b[:, i:i + CH][..., None]
        above = (rows > p_star) | ((rows == p_star) & (iota_a < a_star))
        bits = (rows >= 0.0) & above  # [B, c, A]
        c = bits.shape[1]
        if A < Ap:
            bits = jnp.concatenate(
                [bits, jnp.zeros((B, c, Ap - A), jnp.bool_)], axis=-1)
        words = jnp.sum(
            bits.reshape(B, c, W32, 32).astype(jnp.uint32) << shifts,
            axis=-1, dtype=jnp.uint32)
        outs.append(words)  # [B, c, W32]
    out = jnp.concatenate(outs, axis=1)  # [B, N, W32]
    return out.reshape(like.shape)


def tree_t_to_tree(tt: TreeT) -> Tree:
    """Inverse of :func:`tree_to_tree_t` (drops the derived ``eany``)."""
    t = lambda x: jnp.transpose(x, (1, 0))  # noqa: E731
    t3 = lambda x: t(x.reshape(-1, x.shape[-1]))  # noqa: E731
    big = tt.big_rows
    return Tree(
        node_state=jax.tree_util.tree_map(t3, tt.node_state),
        parent=t(tt.parent),
        parent_action=t(tt.parent_action),
        valids=tt.valids if big else t(tt.valids) > 0.5,
        prior=tt.prior if big else t(tt.prior),
        n=t(tt.n),
        q=t(tt.q),
        v=t(tt.v),
        e=t(tt.e),
        player=t(tt.player),
        edge_prior=t(tt.edge_prior),
        expanded=(_reconstruct_expanded_big(
            tt.prior, tt.nbp, tt.nba, tt.num_actions, tt.expanded)
            if big else t(tt.expanded)),
        nba=t(tt.nba),
        nbp=t(tt.nbp),
        next_free=tt.next_free,
        depth=tt.depth,
        max_depth=tt.max_depth,
        leaf=tt.leaf,
        num_actions=tt.num_actions,
        value_size=tt.value_size,
    )


def slice_rows_t(tt: TreeT, n: int) -> TreeT:
    """View of the first ``n`` node rows of every tree buffer.

    Fresh-tree searches allocate slot k at simulation k, so sims in
    [lo, hi) only ever touch rows < hi — running them on an ``n ≥ hi + 1``
    slice cuts every O(rows) walk/backup/column pass proportionally (the
    growing-arena segmented scan, see search._segment_plan). The TreeT
    uniform-slot write path never scatters to the sink row, so slices merge
    back with no cleanup.
    """
    full = tt.parent.shape[0]

    def cut(buf):
        per = buf.shape[0] // full
        return buf[: n * per]

    def cut_row(buf):  # big-row batch-major buffers: node axis is axis 1
        if not tt.big_rows:
            return cut(buf)
        if buf.ndim == 3:
            return buf[:, :n]
        per = buf.shape[1] // full  # flat [B, N*size]
        return buf[:, : n * per]

    return tt.replace(
        node_state=jax.tree_util.tree_map(cut, tt.node_state),
        parent=cut(tt.parent), parent_action=cut(tt.parent_action),
        valids=cut_row(tt.valids), prior=cut_row(tt.prior), n=cut(tt.n),
        q=cut(tt.q), v=cut(tt.v), e=cut(tt.e), eany=cut(tt.eany),
        player=cut(tt.player), edge_prior=cut(tt.edge_prior),
        expanded=cut_row(tt.expanded), nba=cut(tt.nba), nbp=cut(tt.nbp),
    )


def merge_rows_t(full: TreeT, part: TreeT) -> TreeT:
    """Write a searched slice back over the full buffers (rows beyond the
    slice are untouched by construction)."""
    def m(f, p):
        start = (jnp.int32(0),) * p.ndim
        return jax.lax.dynamic_update_slice(f, p.astype(f.dtype), start)

    return full.replace(
        node_state=jax.tree_util.tree_map(m, full.node_state,
                                          part.node_state),
        parent=m(full.parent, part.parent),
        parent_action=m(full.parent_action, part.parent_action),
        valids=m(full.valids, part.valids), prior=m(full.prior, part.prior),
        n=m(full.n, part.n), q=m(full.q, part.q), v=m(full.v, part.v),
        e=m(full.e, part.e), eany=m(full.eany, part.eany),
        player=m(full.player, part.player),
        edge_prior=m(full.edge_prior, part.edge_prior),
        expanded=m(full.expanded, part.expanded),
        nba=m(full.nba, part.nba), nbp=m(full.nbp, part.nbp),
        next_free=part.next_free, depth=part.depth,
        max_depth=part.max_depth, leaf=part.leaf,
    )


def _set_expanded_bit_t(expanded: jnp.ndarray, node, action, active,
                        num_actions: int) -> jnp.ndarray:
    """Game-minor twin of tree._set_expanded_bit: one fused one-hot select
    over the [N*W32, B] mask."""
    W32 = T._words32(num_actions)
    action = action.astype(jnp.uint32)
    idx = node * W32 + (action >> 5).astype(jnp.int32)  # [B]
    bit = jnp.uint32(1) << (action & jnp.uint32(31))  # [B]
    rows = expanded.shape[0]
    onehot = jax.lax.iota(jnp.int32, rows)[:, None] == idx[None, :]
    return jnp.where(onehot & active[None, :],
                     expanded | bit[None, :], expanded)


def _dus_rows(buf: jnp.ndarray, start_row, block: jnp.ndarray) -> jnp.ndarray:
    """Write a [K, B] slab at a (traced) leading-axis row offset."""
    return jax.lax.dynamic_update_slice(
        buf, block.astype(buf.dtype), (start_row, jnp.int32(0)))


def _gather_states(env, node_state, idx: jnp.ndarray):
    """Read node row ``idx[b]`` of every game b from the GAME-MINOR
    node_state as a one-hot contraction over the node axis.

    Fancy per-game row gathers lower to a scalar path on TPU (~0.19 ms/sim
    at connect4 production scale); the masked reduce is one fused VPU pass
    over each buffer. Returns a game-minor state pytree ([..., B] leaves) —
    feed it to env functions via ``vmap(in_axes=-1)``.
    """
    template = env.init()
    B = idx.shape[0]

    def pick(buf, t):
        b3 = buf  # [N, S, B] — stored 3-D, no per-sim reshape/relayout
        N = b3.shape[0]
        sel = (jax.lax.iota(jnp.int32, N)[:, None] == idx[None, :])  # [N, B]
        sel = sel[:, None, :]
        if buf.dtype == jnp.bool_:
            row = jnp.any(b3 & sel, axis=0)
        else:
            row = jnp.sum(jnp.where(sel, b3, 0), axis=0,
                          dtype=buf.dtype)
        return row.reshape(tuple(jnp.shape(t)) + (B,))

    return jax.tree_util.tree_map(pick, node_state, template)


def _scatter_states_uniform(node_state, states, slot):
    """Write every game's state at the SAME row ``slot`` — a leading-axis
    slab DUS on the game-minor buffers. ``states`` is game-minor
    ([..., B] leaves)."""
    def write(buf, x):
        B = buf.shape[-1]
        x3 = x.reshape(1, -1, B).astype(buf.dtype)  # [1, S, B]
        return jax.lax.dynamic_update_slice(
            buf, x3, (slot, jnp.int32(0), jnp.int32(0)))

    return jax.tree_util.tree_map(write, node_state, states)


def _leaf_data(env, states):
    """(win [B,V] f32, valid [B,A] bool, obs [B,...], player [B]) of
    game-minor stepped states ([..., B] leaves). Uses the env's fused
    win_and_valids when provided (see tree._win_valids)."""
    win, valid = jax.vmap(lambda s: T._win_valids(env, s),
                          in_axes=-1)(states)
    win = win.astype(jnp.float32)
    obs = jax.vmap(env.observation, in_axes=-1)(states)
    return win, valid, obs, states.player


def _write_expansion(tt: TreeT, slot, win, valid, player) -> TreeT:
    """Expansion writes at the batch-uniform ``slot``: player/terminal/valids
    (MCTS.pyx:223-226), each a tiny leading-axis slab."""
    V = tt.value_size
    A = tt.num_actions
    if tt.big_rows:  # batch-major [B, N, A]: one [B, 1, A] slab
        new_valids = jax.lax.dynamic_update_slice(
            tt.valids, valid[:, None, :].astype(tt.valids.dtype),
            (jnp.int32(0), slot, jnp.int32(0)))
    else:
        new_valids = _dus_rows(tt.valids, slot * A,
                               jnp.transpose(valid, (1, 0)))
    return tt.replace(
        player=_dus_rows(tt.player, slot, player[None, :]),
        e=_dus_rows(tt.e, slot * V, jnp.transpose(win, (1, 0))),
        eany=_dus_rows(tt.eany, slot,
                       jnp.any(win > 0, axis=-1)[None, :]),
        valids=new_valids,
    )


def _root_states(env, node_state):
    """Row 0 of every game's node_state — a STATIC slice, no gather.
    Returns a game-minor state pytree."""
    template = env.init()

    def row0(buf, t):
        B = buf.shape[-1]
        return buf[0].reshape(tuple(jnp.shape(t)) + (B,))

    return jax.tree_util.tree_map(row0, node_state, template)


def expand_root_t(env, tt: TreeT):
    """First simulation on a FRESH tree (see tree.expand_root).

    Returns (tt, obs, e_leaf, leaf_valids).
    """
    B = tt.leaf.shape[0]
    win, valid, obs, player = _leaf_data(env, _root_states(env, tt.node_state))
    tt = _write_expansion(tt, jnp.int32(0), win, valid, player)
    tt = tt.replace(depth=jnp.zeros((B,), jnp.int32),
                    leaf=jnp.zeros((B,), jnp.int32))
    return tt, obs, win, valid


def apply_walk_observe_t(env, tt: TreeT, node, action, child, depth,
                         skip_walk, p_sel, slot, multi_leaf: bool = False):
    """Uniform-slot apply_walk in game-minor layout (see
    tree._apply_walk_uniform for the write-strategy rationale).

    ``multi_leaf`` (static): under multi-leaf rounds (search.py) a walk may
    stop at a PENDING round-mate child, where the stepped state
    ``step(state[node], action)`` is garbage (node is the pending child
    itself, like the terminal-revisit case) but its observation is LIVE —
    so obs/valids are re-derived from the stored leaf state instead. Costs
    one extra node_state contraction per walk; never enabled at
    leaf_batch=1.

    Returns (tt, obs, e_leaf, leaf_valids).
    """
    V = tt.value_size
    slot = jnp.asarray(slot, jnp.int32)
    need_alloc = (child == UNVISITED) & ~skip_walk  # [B]

    parent_states = _gather_states(env, tt.node_state, node)
    child_states = jax.vmap(env.step, in_axes=-1, out_axes=-1)(
        parent_states, action)
    win, valid, obs, player = _leaf_data(env, child_states)

    # Edge insertion: blend the slot's parent/parent_action row (games that
    # did not allocate keep UNVISITED there → the junk slot stays
    # unreachable by derived edges).
    B = node.shape[0]
    old_p = jax.lax.dynamic_slice(tt.parent, (slot, 0), (1, B))
    old_a = jax.lax.dynamic_slice(tt.parent_action, (slot, 0), (1, B))
    # Advance the expansion parent's rank-walk pointer (tree._next_best):
    # one prior-row read per game per sim — the only per-sim [A]-row pass.
    if tt.big_rows:
        prow = jnp.take_along_axis(  # [B, A] fast batched row gather
            tt.prior, node[:, None, None], axis=1)[:, 0]
        # Big-row mode skips the expanded bitmask entirely: the kernel
        # reads only the pointers, and the mask is reconstructed from the
        # expansion-order invariant at conversion (tree_t_to_tree).
        new_expanded = tt.expanded
    else:
        N = tt.parent.shape[0]
        A = tt.num_actions
        sel_n = (jax.lax.iota(jnp.int32, N)[:, None] == node[None, :])
        prow = jnp.transpose(jnp.sum(
            jnp.where(sel_n[:, None, :], tt.prior.reshape(N, A, B), 0.0),
            axis=0), (1, 0))  # [B, A]
        new_expanded = _set_expanded_bit_t(tt.expanded, node, action,
                                           need_alloc, tt.num_actions)
    nb_a, nb_p = T._next_best(prow, p_sel, action)  # [B] each
    Nrows = tt.parent.shape[0]
    sel_upd = ((jax.lax.iota(jnp.int32, Nrows)[:, None] == node[None, :])
               & need_alloc[None, :])
    tt = tt.replace(
        node_state=_scatter_states_uniform(tt.node_state, child_states, slot),
        parent=_dus_rows(tt.parent, slot,
                         jnp.where(need_alloc[None, :], node[None, :], old_p)),
        parent_action=_dus_rows(
            tt.parent_action, slot,
            jnp.where(need_alloc[None, :], action[None, :], old_a)),
        expanded=new_expanded,
        nba=jnp.where(sel_upd, nb_a[None, :], tt.nba),
        nbp=jnp.where(sel_upd, nb_p[None, :], tt.nbp),
        # Unconditional: non-allocating games leave junk at an unreachable
        # slot (their parent row stays UNVISITED).
        edge_prior=_dus_rows(tt.edge_prior, slot, p_sel[None, :]),
        next_free=jnp.broadcast_to(slot + 1, (B,)),
    )
    leaf = jnp.where(skip_walk, ROOT, jnp.where(need_alloc, slot, child))
    tt = _write_expansion(tt, slot, win, valid, player)
    tt = tt.replace(depth=depth, max_depth=jnp.maximum(tt.max_depth, depth),
                    leaf=leaf)
    # The leaf's terminal vector comes from the STORED e row (one-hot
    # contraction at ``leaf`` over the just-updated buffer) — NOT from the
    # stepped state: re-stepping an already-terminal child can change the
    # winner (see tree._apply_walk_uniform).
    rows = tt.parent.shape[0]
    sel = (jax.lax.iota(jnp.int32, rows)[:, None] == leaf[None, :])  # [N, B]
    e_leaf = jnp.sum(jnp.where(sel[:, None, :], tt.e.reshape(rows, V, -1),
                               0.0), axis=0)  # [V, B]
    if multi_leaf:
        # Pending-leaf stops make the stepped state garbage while its
        # observation is still consumed — rebuild obs/valids from the
        # stored leaf row (covers all leaf cases: new slot, terminal
        # revisit, pending round-mate, root).
        leaf_states = _gather_states(env, tt.node_state, leaf)
        obs = jax.vmap(env.observation, in_axes=-1)(leaf_states)
        valid = jax.vmap(env.valid_moves, in_axes=-1)(leaf_states)
    return tt, obs, jnp.transpose(e_leaf, (1, 0)), valid


def install_prior_t(tt: TreeT, pi: jnp.ndarray, spec: SearchSpec,
                    rng_keys: jnp.ndarray, add_root_noise, add_root_temp,
                    root_adjust: bool, slot, leaf_valids: jnp.ndarray) -> TreeT:
    """Batched install_prior (tree.install_prior semantics, MCTS.pyx:236-258)
    writing the prior slab at the batch-uniform ``slot``.

    ``rng_keys`` are the SAME per-game keys the batch-major path feeds its
    vmapped install_prior — the Dirichlet draws match bit-for-bit.
    """
    if add_root_noise is None:
        add_root_noise = spec.add_root_noise
    if add_root_temp is None:
        add_root_temp = spec.add_root_temp
    A = tt.num_actions
    # Same per-game split discipline as tree.install_prior: key → (noise
    # key, tie key) — the Dirichlet/tie draws match the batch-major path
    # bit-for-bit.
    split_keys = jax.vmap(jax.random.split)(rng_keys)  # [B, 2, 2]
    rng_keys = split_keys[:, 0]
    tie_keys = split_keys[:, 1]
    valids = leaf_valids  # [B, A] bool
    masked = jnp.where(valids, pi, 0.0)
    norm = jnp.sum(masked, axis=-1, keepdims=True)
    nvalid = jnp.maximum(jnp.sum(valids, axis=-1, keepdims=True), 1)
    masked = jnp.where(norm > 0, masked / norm,
                       valids.astype(jnp.float32) / nvalid)

    if root_adjust:
        is_root = (tt.leaf == ROOT)[:, None]

        def adjust(p, valid, key):
            temped = jnp.where(
                jnp.asarray(add_root_temp),
                _renorm(jnp.where(valid,
                                  p ** (1.0 / spec.root_policy_temp), 0.0)),
                p,
            )
            num_valid = jnp.maximum(jnp.sum(valid), 1)
            alpha = NOISE_ALPHA_RATIO / num_valid.astype(jnp.float32)
            gam = jax.random.gamma(key, alpha, (A,))
            gam = jnp.where(valid, gam, 0.0)
            noise = gam / jnp.maximum(jnp.sum(gam), 1e-30)
            noised = (temped * (1 - spec.root_noise_frac)
                      + spec.root_noise_frac * noise)
            noised = jnp.where(valid, noised, 0.0)
            return jnp.where(jnp.asarray(add_root_noise), noised, temped)

        adjusted = jax.vmap(adjust)(masked, valids, rng_keys)
        new_prior = jnp.where(is_root, adjusted, masked)
    else:
        new_prior = masked
    # Per-expansion tie noise (see tree.install_prior).
    if spec.tie_noise:
        tie = jax.vmap(lambda k: jax.random.uniform(k, (A,)))(tie_keys)
        new_prior = jnp.where(valids, new_prior + tie * spec.tie_noise,
                              new_prior)
    # Pack the valid mask into the stored row (tree.INVALID_PRIOR sentinel).
    new_prior = jnp.where(valids, new_prior, jnp.float32(T.INVALID_PRIOR))
    # Fresh rank-walk pointer for the installed row (tree.install_prior).
    nb_a, nb_p = T._next_best(new_prior)  # [B] each
    slot = jnp.asarray(slot, jnp.int32)
    if tt.big_rows:  # batch-major [B, N, A]: one [B, 1, A] slab
        prior_out = jax.lax.dynamic_update_slice(
            tt.prior, new_prior[:, None, :], (jnp.int32(0), slot,
                                              jnp.int32(0)))
    else:
        prior_out = _dus_rows(tt.prior, slot * A,
                              jnp.transpose(new_prior, (1, 0)))
    return tt.replace(prior=prior_out,
                      nba=_dus_rows(tt.nba, slot, nb_a[None, :]),
                      nbp=_dus_rows(tt.nbp, slot, nb_p[None, :]))
