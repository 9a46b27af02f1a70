"""Batched MCTS backup as a Pallas TPU kernel.

Fuses the leaf-to-root value propagation (mcts/tree.py `backup`,
MCTS.pyx:260-289) for a 128-game lane block into one program: the n/q/v
columns are updated in place in VMEM, node indexing is masked reduction over
the node axis, the walk loop runs on-chip. I/O is a handful of [N, LANES]
columns — the descent kernel reads child stats through the child index, so
no per-edge arrays exist. Terminal-value resolution and prior installation
stay in XLA (cheap row ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alphazero_general_tpu.mcts.tree import DRAW_VALUE, SearchSpec

LANES = 128


def _backup_kernel(parent_ref, player_ref, leaf_ref, value_ref,
                   maxd_ref, n_in, q_in, v_in,
                   n_io, q_io, v_io, *, spec: SearchSpec,
                   num_nodes: int):
    N = num_nodes
    V = spec.value_size
    iota_nl = jax.lax.broadcasted_iota(jnp.int32, (N, LANES), 0)
    iota_vl = jax.lax.broadcasted_iota(jnp.int32, (V, LANES), 0)

    parent = parent_ref[...]
    player = player_ref[...]
    value = value_ref[...]  # [V, LANES]
    maxd = maxd_ref[...]  # [1, LANES] f32
    n_io[...] = n_in[...]
    q_io[...] = q_in[...]
    v_io[...] = v_in[...]

    def get_i(arr, idx):  # arr [N, L] i32, idx [1, L] → [1, L] i32
        sel = (iota_nl == idx).astype(jnp.int32)
        return jnp.sum(arr * sel, axis=0, keepdims=True)

    def get_f(arr, idx):
        sel = (iota_nl == idx).astype(jnp.float32)
        return jnp.sum(arr * sel, axis=0, keepdims=True)

    def value_at(p):  # p [1, L] player index → [1, L] value w/ draw credit
        sel = (iota_vl == p).astype(jnp.float32)
        val = jnp.sum(value * sel, axis=0, keepdims=True)
        if spec.has_draw:
            val = val + value[V - 1 : V, :] / spec.num_players
        return val

    log_md = jnp.log(jnp.float32(max(spec.min_discount, 1e-9)))

    def cond(carry):
        node, _i = carry
        return jnp.any(node != 0)

    def body(carry):
        node, i = carry
        active = node != 0
        par = get_i(parent, node)
        val = value_at(get_i(player, par))
        frac = i.astype(jnp.float32) / maxd
        discount = jnp.exp(frac * log_md)
        discount = jnp.where(val < DRAW_VALUE, 2.0 - discount, discount)
        discount = jnp.where(val == DRAW_VALUE, 1.0, discount)

        n_node = get_f(n_io[...].astype(jnp.float32), node)
        q_node = get_f(q_io[...], node)
        new_q = (q_node * n_node + val * discount) / (n_node + 1.0)
        own_v = value_at(get_i(player, node))
        new_v = jnp.where(n_node < 0.5, own_v, get_f(v_io[...], node))

        onehot = (iota_nl == node) & active
        q_io[...] = jnp.where(onehot, new_q, q_io[...])
        v_io[...] = jnp.where(onehot, new_v, v_io[...])
        n_io[...] = jnp.where(onehot, n_io[...] + 1, n_io[...])

        node = jnp.where(active, par, node)
        i = i + active.astype(jnp.int32)
        return node, i

    leaf = leaf_ref[...]
    jax.lax.while_loop(cond, body, (leaf, jnp.zeros((1, LANES), jnp.int32)))

    # Root updates (MCTS.pyx:289 + root-v-on-first-expansion).
    root_player = player_ref[0:1, :]
    own_v_root = value_at(root_player)
    root_n = n_io[0:1, :]
    v_io[0:1, :] = jnp.where(root_n == 0, own_v_root, v_io[0:1, :])
    n_io[0:1, :] = root_n + 1


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def backup_batched_pallas(parent, player, leaf, value, max_depth, n, q,
                          v, spec: SearchSpec, interpret: bool = False):
    """Batched backup. Batch-major inputs (as held by the vmapped Tree).

    Returns updated (n, q, v).
    """
    B, N = parent.shape
    Bp = -(-B // LANES) * LANES
    if Bp != B:  # pad to a lane tile; padded lanes back up a no-op root
        pad1 = lambda x: jnp.pad(x, ((0, Bp - B),))  # noqa: E731
        pad2 = lambda x: jnp.pad(x, ((0, Bp - B), (0, 0)))  # noqa: E731
        n2, q2, v2 = backup_batched_pallas(
            pad2(parent), pad2(player), pad1(leaf), pad2(value),
            pad1(max_depth), pad2(n), pad2(q), pad2(v), spec,
            interpret=interpret)
        return n2[:B], q2[:B], v2[:B]

    pt = jnp.transpose(parent, (1, 0))
    plt_ = jnp.transpose(player, (1, 0))
    vt = jnp.transpose(value, (1, 0))
    nt = jnp.transpose(n, (1, 0))
    qt = jnp.transpose(q, (1, 0))
    vvt = jnp.transpose(v, (1, 0))
    leaf2 = leaf[None, :]
    maxd = jnp.maximum(max_depth.astype(jnp.float32), 1.0)[None, :]

    grid = (B // LANES,)
    kernel = functools.partial(_backup_kernel, spec=spec, num_nodes=N)

    def nl():
        return pl.BlockSpec((N, LANES), lambda g: (0, g),
                            memory_space=pltpu.VMEM)

    def rl(rows=1):
        return pl.BlockSpec((rows, LANES), lambda g: (0, g),
                            memory_space=pltpu.VMEM)

    n2, q2, v2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            nl(),  # parent
            nl(),  # player
            rl(),  # leaf
            rl(value.shape[1]),  # value
            rl(),  # maxd
            nl(),  # n
            nl(),  # q
            nl(),  # v
        ],
        out_specs=(nl(), nl(), nl()),
        out_shape=(
            jax.ShapeDtypeStruct((N, B), jnp.int32),
            jax.ShapeDtypeStruct((N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, B), jnp.float32),
        ),
        interpret=interpret,
    )(pt, plt_, leaf2, vt, maxd, nt, qt, vvt)
    return (
        jnp.transpose(n2, (1, 0)),
        jnp.transpose(q2, (1, 0)),
        jnp.transpose(v2, (1, 0)),
    )


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def backup_batched_pallas_t(parent, player, leaf, value, max_depth, n, q,
                            v, spec: SearchSpec, interpret: bool = False):
    """Game-minor twin of :func:`backup_batched_pallas`: parent/player/n/q/v
    are ALREADY [N, B] columns (persistent TreeT layout) — no column
    transposes in or out; only the per-game [B]-vectors (leaf/value/maxd)
    are reshaped. Returns updated (n, q, v) columns."""
    N, B = parent.shape
    Bp = -(-B // LANES) * LANES
    if Bp != B:  # lane-tile pad; see backup_batched_pallas
        padc = lambda x: jnp.pad(x, ((0, 0), (0, Bp - B)))  # noqa: E731
        pad1 = lambda x: jnp.pad(x, ((0, Bp - B),))  # noqa: E731
        pad2 = lambda x: jnp.pad(x, ((0, Bp - B), (0, 0)))  # noqa: E731
        n2, q2, v2 = backup_batched_pallas_t(
            padc(parent), padc(player), pad1(leaf), pad2(value),
            pad1(max_depth), padc(n), padc(q), padc(v), spec,
            interpret=interpret)
        return n2[:, :B], q2[:, :B], v2[:, :B]

    vt = jnp.transpose(value, (1, 0))
    leaf2 = leaf[None, :]
    maxd = jnp.maximum(max_depth.astype(jnp.float32), 1.0)[None, :]

    grid = (B // LANES,)
    kernel = functools.partial(_backup_kernel, spec=spec, num_nodes=N)

    def nl():
        return pl.BlockSpec((N, LANES), lambda g: (0, g),
                            memory_space=pltpu.VMEM)

    def rl(rows=1):
        return pl.BlockSpec((rows, LANES), lambda g: (0, g),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            nl(),  # parent
            nl(),  # player
            rl(),  # leaf
            rl(value.shape[1]),  # value
            rl(),  # maxd
            nl(),  # n
            nl(),  # q
            nl(),  # v
        ],
        out_specs=(nl(), nl(), nl()),
        out_shape=(
            jax.ShapeDtypeStruct((N, B), jnp.int32),
            jax.ShapeDtypeStruct((N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, B), jnp.float32),
        ),
        interpret=interpret,
    )(parent, player, leaf2, vt, maxd, n, q, v)


def backup_batched_t(tt, values, spec: SearchSpec, interpret: bool = False):
    """Fused backup on a game-minor TreeT; ``values`` is [B, V] (already
    terminal-resolved)."""
    n, q, v = backup_batched_pallas_t(
        tt.parent, tt.player, tt.leaf, values, tt.max_depth,
        tt.n, tt.q, tt.v, spec, interpret=interpret,
    )
    return tt.replace(n=n, q=q, v=v)


def backup_batched(trees, values, spec: SearchSpec, interpret: bool = False):
    """Apply the fused backup to a vmapped Tree pytree; returns new trees.

    ``values`` must already be terminal-resolved (tree.resolve_value).
    """
    n, q, v = backup_batched_pallas(
        trees.parent, trees.player, trees.leaf, values,
        trees.max_depth, trees.n, trees.q, trees.v, spec, interpret=interpret,
    )
    return trees.replace(n=n, q=q, v=v)
