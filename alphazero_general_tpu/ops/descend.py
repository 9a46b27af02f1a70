"""Batched PUCT descent as a Pallas TPU kernel.

The XLA formulation of the tree walk (mcts/tree.py `descend`, vmapped) pays a
fixed dispatch/sync cost per `lax.while_loop` iteration — at typical tree
depths that overhead dominates the whole self-play step (the network forward
is ~100x cheaper than the walk). This kernel fuses the complete walk for a
block of games into one program: tree arrays live in VMEM in game-minor
layout ([N, LANES] columns — games ride the 128-wide lane dimension), and
the while loop runs entirely on-chip.

The kernel's footprint is INDEPENDENT of the action-space size: it never
touches the [N, A] prior rows. The unexpanded arm of the PUCT split only
ever needs the node's best unexpanded valid action — and because fpu/sqrt_n
are constant across actions at a node, that action is the argmax-prior
unexpanded one, which the tree maintains incrementally as the per-node
rank-walk pointer columns ``nba``/``nbp`` (see mcts/tree.py Tree.nba:
actions expand in strictly descending (prior, -index) order, so one pointer
advance per expansion suffices). Per walk step the kernel does a handful of
[N, LANES] masked-reduction passes; nothing scales with A — hnefatafl
(A=2420) and chess (A=4672) run the same kernel as connect4 (A=7).

Semantics are identical to `descend` (MCTS.pyx:208-217): PUCT with
FPU-reduction from seen policy, stop at an unallocated edge or terminal
child; random tie order lives in the stored prior rows
(SearchSpec.tie_noise), so the kernel draws no randomness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alphazero_general_tpu.mcts.tree import SearchSpec

LANES = 128
NEG_INF = -3.0e38
UNVISITED = -1  # plain int: jnp scalars would be captured consts in the kernel


def _descend_kernel(parent_ref, pa_ref, n_ref, q_ref,
                    v_ref, ep_ref, eany_ref, nba_ref, nbp_ref,
                    out_ref, psel_ref,
                    *, spec: SearchSpec, num_nodes: int):
    N = num_nodes
    node_iota1 = jax.lax.broadcasted_iota(jnp.int32, (N, LANES), 0)

    n_all = n_ref[...]  # [N, LANES] i32
    n_all_f = n_all.astype(jnp.float32)
    q_all = q_ref[...]  # [N, LANES] f32
    v_all = v_ref[...]  # [N, LANES] f32
    ep_all = ep_ref[...]  # [N, LANES] f32 edge priors
    eany_all = eany_ref[...]  # [N, LANES] f32 (1.0 = terminal)
    parent_all = parent_ref[...]  # [N, LANES] i32
    pa_all = pa_ref[...]  # [N, LANES] i32
    nba_all = nba_ref[...]  # [N, LANES] i32 rank-walk pointer: action id
    nbp_all = nbp_ref[...]  # [N, LANES] f32 rank-walk pointer: prior
    # The dummy write sink (last row) accumulates junk parent/parent_action
    # values from masked scatters; it must never be derived as a child.
    not_dummy1 = node_iota1 < (N - 1)

    root_n = n_all[0]  # [LANES]
    root_eany = eany_all[0]
    # done carried as int32 0/1 — Mosaic mis-lays-out i1 while-loop carries.
    init_done = ((root_n == 0) | (root_eany > 0.5)).astype(jnp.int32)

    def cond(carry):
        _node, _action, _child, _depth, done, _p = carry
        return jnp.logical_not(jnp.all(done > 0))

    def body(carry):
        node, action, child, depth, done_i, p_sel = carry  # [1, LANES] each
        done = done_i > 0
        sel1 = node_iota1 == node  # [N, LANES]
        sel1f = sel1.astype(jnp.float32)
        cur_n = jnp.sum(n_all_f * sel1f, axis=0, keepdims=True)  # [1, LANES]
        cur_v = jnp.sum(v_all * sel1f, axis=0, keepdims=True)

        # Children of the current node (allocated children always have
        # n > 0, so this existence test needs no visit counts).
        childmask = (parent_all == node) & not_dummy1  # [N, LANES]
        childf = childmask.astype(jnp.float32)
        seen_policy = jnp.sum(ep_all * childf, axis=0, keepdims=True)
        fpu_value = cur_v - spec.fpu_reduction * jnp.sqrt(
            jnp.maximum(seen_policy, 0.0))
        sqrt_n = jnp.sqrt(cur_n)

        # Visited children, scored in node space (MCTS.pyx:86-87 n>0 arm).
        score_c = q_all + spec.cpuct * ep_all * sqrt_n / (1.0 + n_all_f)
        score_c = jnp.where(childmask, score_c, NEG_INF)
        c_star = jnp.argmax(score_c, axis=0).astype(jnp.int32)[None]
        best_c = jnp.max(score_c, axis=0, keepdims=True)  # [1, LANES]
        selc = (node_iota1 == c_star)
        selcf = selc.astype(jnp.float32)
        a_c = jnp.sum(jnp.where(selc, pa_all, 0), axis=0, keepdims=True)
        ep_c = jnp.sum(ep_all * selcf, axis=0, keepdims=True)
        # Terminal OR pending (n == 0, multi-leaf rounds) children end the
        # walk — see tree.descend.
        stopv = jnp.where(eany_all > 0.5, 1.0, 0.0) + jnp.where(
            n_all_f == 0.0, 1.0, 0.0)
        term_c = jnp.sum(stopv * selcf, axis=0, keepdims=True) > 0.5

        # Best unexpanded valid action — the node's rank-walk pointer
        # (tree.Tree.nba), maintained outside the kernel. One [N, LANES]
        # reduction each; the old [N, A, LANES] prior-row pass is gone.
        a_u = jnp.sum(jnp.where(sel1, nba_all, 0), axis=0, keepdims=True)
        pv_u = jnp.sum(nbp_all * sel1f, axis=0, keepdims=True)
        has_u = pv_u >= 0.0  # NBP_NONE sentinel < 0 = arm empty
        best_u = jnp.where(has_u,
                           fpu_value + spec.cpuct * pv_u * sqrt_n, NEG_INF)

        child_wins = best_c > best_u  # exact tie → unexpanded action
        new_action = jnp.where(child_wins, a_c, a_u)
        new_child = jnp.where(child_wins, c_star, UNVISITED)
        new_p_sel = jnp.where(child_wins, ep_c, pv_u)
        # int32 select — Mosaic rejects i1-vector selects with scalar arms.
        step_done = jnp.where(child_wins, term_c.astype(jnp.int32), 1)
        new_node = jnp.where(child_wins, c_star, node)

        node = jnp.where(done, node, new_node)
        action = jnp.where(done, action, new_action)
        child = jnp.where(done, child, new_child)
        depth = jnp.where(done, depth, depth + 1)
        p_sel = jnp.where(done, p_sel, new_p_sel)
        done_i = jnp.maximum(done_i, step_done)
        return node, action, child, depth, done_i, p_sel

    zeros = jnp.zeros((1, LANES), jnp.int32)
    node, action, child, depth, done, p_sel = jax.lax.while_loop(
        cond, body,
        (zeros, zeros, jnp.full((1, LANES), UNVISITED, jnp.int32), zeros,
         init_done[None], jnp.zeros((1, LANES), jnp.float32)),
    )
    out_ref[0, :] = node[0]
    out_ref[1, :] = action[0]
    out_ref[2, :] = child[0]
    out_ref[3, :] = depth[0]
    psel_ref[0, :] = p_sel[0]


def _call_descend(parent, parent_action, n, q, v, edge_prior, eany,
                  nba, nbp, spec: SearchSpec, interpret: bool):
    """Shared pallas_call: all inputs already game-minor [N, B] columns.

    Batches that are not a lane-tile multiple are zero-padded (a padded
    lane's root has n == 0, so its walk is done before it starts) and the
    outputs sliced back — production batches are multiples of 128, so the
    pad path only runs in tests/dryruns."""
    N, B = parent.shape
    Bp = -(-B // LANES) * LANES
    if Bp != B:
        pad = lambda x: jnp.pad(x, ((0, 0), (0, Bp - B)))  # noqa: E731
        o = _call_descend(pad(parent), pad(parent_action), pad(n), pad(q),
                          pad(v), pad(edge_prior), pad(eany), pad(nba),
                          pad(nbp), spec, interpret)
        return tuple(x[:B] for x in o)

    grid = (B // LANES,)
    kernel = functools.partial(_descend_kernel, spec=spec, num_nodes=N)

    def nb():
        return pl.BlockSpec((N, LANES), lambda g: (0, g),
                            memory_space=pltpu.VMEM)

    out, psel = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            nb(),  # parent
            nb(),  # parent_action
            nb(),  # n
            nb(),  # q
            nb(),  # v
            nb(),  # edge_prior
            nb(),  # eany
            nb(),  # nba
            nb(),  # nbp
        ],
        out_specs=(
            pl.BlockSpec((4, LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ),
        interpret=interpret,
    )(parent, parent_action, n, q, v, edge_prior, eany, nba, nbp)
    return out[0], out[1], out[2], out[3], psel[0]


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def descend_batched_pallas(parent, parent_action, n, q, v, edge_prior,
                           eany, nba, nbp, spec: SearchSpec,
                           interpret: bool = False):
    """Batched walk. Inputs are the batched tree columns (batch-major, as
    held by the vmapped Tree) — transposed here to game-minor layout.

    Returns (node, action, child, depth, p_sel): int32[B] x4 + float32[B].
    """
    t = lambda x: jnp.transpose(x, (1, 0))  # noqa: E731
    return _call_descend(t(parent), t(parent_action), t(n), t(q), t(v),
                         t(edge_prior), t(eany.astype(jnp.float32)),
                         t(nba), t(nbp), spec, interpret)


def descend_batched_t(tt, spec: SearchSpec, interpret: bool = False):
    """Walk on a game-minor TreeT — inputs are ALREADY [N, B] columns, so no
    per-sim transposes happen at all.

    Returns (node, action, child, depth, skip_walk, p_sel)."""
    node, action, child, depth, p_sel = _call_descend(
        tt.parent, tt.parent_action, tt.n, tt.q, tt.v, tt.edge_prior,
        tt.eany, tt.nba, tt.nbp, spec, interpret=interpret,
    )
    skip_walk = (tt.n[0] == 0) | (tt.eany[0] > 0.5)
    depth = jnp.where(skip_walk, 0, depth)
    return node, action, child, depth, skip_walk, p_sel


def descend_batched(trees, spec: SearchSpec, interpret: bool = False):
    """Walk every game's tree; trees is a vmapped Tree pytree [B, ...].

    Returns (node, action, child, depth, skip_walk, p_sel) like
    vmap(tree.descend) but as one fused kernel.
    """
    B = trees.n.shape[0]
    N = trees.n.shape[1]
    V = trees.value_size
    eany = jnp.any(trees.e.reshape(B, N, V) > 0, axis=-1)
    node, action, child, depth, p_sel = descend_batched_pallas(
        trees.parent, trees.parent_action,
        trees.n, trees.q, trees.v, trees.edge_prior, eany,
        trees.nba, trees.nbp, spec, interpret=interpret,
    )
    skip_walk = (trees.n[:, 0] == 0) | eany[:, 0]
    depth = jnp.where(skip_walk, 0, depth)
    return node, action, child, depth, skip_walk, p_sel
