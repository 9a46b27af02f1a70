"""Batched search drivers over the array tree.

The reference routes leaf observations from worker processes to a central GPU
inference server through shared-memory tensors (reference:
alphazero/SelfPlayAgent.pyx:103-151, Coach.py:325-344). Here a "simulation
round" is one fused program: vmapped find_leaf → one batched network call →
vmapped process_results, scanned ``sims`` times under jit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from alphazero_general_tpu.mcts import tree as T

# An EvalFn maps a batch of observations [B, C, H, W] to
# (policy [B, A], value [B, value_size]); both are *probabilities*, matching
# the reference's NNetWrapper.process which exponentiates log-softmax outputs
# (NNetWrapper.py:225-232).
EvalFn = Callable[[jnp.ndarray], tuple]


def init_batched_trees(env, states, capacity: int, value_size: int):
    """states: batched env-state pytree [B, ...] → batched Tree [B, ...]."""
    return jax.vmap(lambda s: T.init_tree(env, s, capacity, value_size))(states)


#: VMEM budget gate for the Pallas descent kernel. The rank-walk redesign
#: (tree.Tree.nba / ops/descend.py) made the kernel's footprint independent
#: of the action-space size: it holds ~9 [N, 128] f32/i32 columns plus a few
#: temporaries against the 16 MB scoped-VMEM limit, so the gate is on node
#: count alone — hnefatafl (A=2420) and chess (A=4672) run the same kernel
#: as connect4.
_PALLAS_MAX_NODES = 2048

#: Node-count gate for the Pallas backup kernel: it holds fewer [N, 128]
#: columns, so the limit is a little higher than the walk's.
_PALLAS_BACKUP_MAX_NODES = 4096


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:  # pragma: no cover
        return False


def _pick_walk_impl(trees, walk_impl: str) -> str:
    if walk_impl != "auto":
        return walk_impl
    B, N = trees.n.shape
    if _on_tpu() and B % 128 == 0 and N <= _PALLAS_MAX_NODES:
        return "pallas"
    return "xla"


def _pick_backup_impl(trees, walk_impl: str) -> str:
    """The slim backup kernel carries no per-edge arrays, so its gate is on
    node count only — large-action trees qualify even when the walk falls
    back to XLA."""
    if walk_impl != "auto":
        return walk_impl
    B, N = trees.n.shape
    if _on_tpu() and B % 128 == 0 and N <= _PALLAS_BACKUP_MAX_NODES:
        return "pallas"
    return "xla"


def _batched_walk(trees, spec, walk_impl: str):
    if walk_impl in ("pallas", "pallas_interpret"):
        from alphazero_general_tpu.ops.descend import descend_batched

        return descend_batched(
            trees, spec,
            interpret=walk_impl == "pallas_interpret",
        )
    return jax.vmap(lambda t: T.descend(t, spec))(trees)


def simulate_step(env, trees, spec: T.SearchSpec, eval_fn: EvalFn,
                  rng: jnp.ndarray, add_root_noise=None, add_root_temp=None,
                  root_adjust: bool = True, walk_impl: str = "auto",
                  uniform_slot=None, expand_root_only: bool = False,
                  backup_impl: str | None = None):
    """One simulation round for every game in the batch.

    ``walk_impl``: 'auto' | 'pallas' | 'pallas_interpret' | 'xla' — which
    implementation performs the PUCT descent (identical semantics).
    ``backup_impl``: separate choice for the backup kernel (defaults to
    ``walk_impl``; the backup gate is looser, see _pick_backup_impl).
    Segmented searches PIN both on the full-arena shape so one search never
    mixes implementations across its arena slices.

    ``uniform_slot``: fresh-tree fast path (see tree.apply_walk) — the slot
    simulation k allocates is k, identical for every game, so the big-row
    writes lower as dynamic-update-slices instead of scatters.
    ``expand_root_only`` (static): the very first simulation on a fresh tree
    — every game's leaf is the root; the walk is skipped entirely.
    """
    B = trees.n.shape[0]
    # The walk draws no RNG (tie order lives in the stored priors —
    # SearchSpec.tie_noise); rng splits once for the install-time draws.
    _, rng_noise = jax.random.split(rng)

    leaf_e = leaf_valids = None
    if expand_root_only:
        trees, obs, leaf_e, leaf_valids = jax.vmap(
            lambda t: T.expand_root(env, t))(trees)
    else:
        walk = _batched_walk(trees, spec,
                             _pick_walk_impl(trees, walk_impl))
        if uniform_slot is None:
            trees = jax.vmap(
                lambda t, n_, a_, c_, d_, s_, p_: T.apply_walk(
                    env, t, n_, a_, c_, d_, s_, p_)
            )(trees, *walk)
            obs = jax.vmap(lambda t: T.leaf_observation(env, t))(trees)
        else:
            trees, obs, leaf_e, leaf_valids = jax.vmap(
                lambda t, n_, a_, c_, d_, s_, p_: T.apply_walk_observe(
                    env, t, n_, a_, c_, d_, s_, p_, uniform_slot)
            )(trees, *walk)

    pi, value = eval_fn(obs)

    if leaf_e is not None:
        # Terminal resolution from the freshly stepped leaf data — no
        # per-game dynamic row gather on the flat e buffer (MCTS.pyx:234-235
        # semantics, see tree._apply_walk_uniform).
        is_term = jnp.any(leaf_e > 0, axis=-1, keepdims=True)
        values = jnp.where(is_term, leaf_e, value)
    else:
        values = jax.vmap(T.resolve_value)(trees, value)
    if leaf_valids is not None:
        trees = jax.vmap(
            lambda t, p, r, lv: T.install_prior(
                t, p, spec, r, add_root_noise, add_root_temp,
                root_adjust=root_adjust, uniform_slot=uniform_slot,
                leaf_valids=lv,
            )
        )(trees, pi, jax.random.split(rng_noise, B), leaf_valids)
    else:
        trees = jax.vmap(
            lambda t, p, r: T.install_prior(
                t, p, spec, r, add_root_noise, add_root_temp,
                root_adjust=root_adjust, uniform_slot=uniform_slot,
            )
        )(trees, pi, jax.random.split(rng_noise, B))

    use_pallas_backup = _pick_backup_impl(trees, backup_impl or walk_impl) in (
        "pallas", "pallas_interpret")
    if use_pallas_backup:
        from alphazero_general_tpu.ops.backup import backup_batched

        trees = backup_batched(trees, values, spec,
                               interpret=walk_impl == "pallas_interpret")
    else:
        trees = jax.vmap(
            lambda t, v: T.backup(t, v, spec)
        )(trees, values)
    return trees


def _segment_plan(sims: int, rows: int, min_nodes: int = 32):
    """Growing-arena schedule for fresh-tree search scans.

    Simulation k on a fresh tree allocates slot k and walks only rows < k,
    yet a single scan pays O(rows) per sim on every walk/backup/column pass.
    Splitting the scan into segments that run on a leading-row slice of the
    arena (doubling from ``min_nodes``) cuts the total tree-op cost to
    ~0.55-0.65x with a handful of extra compiled program shapes.

    Returns [(n_rows, lo, hi)]: sims k in [lo, hi) run on the first n_rows
    rows. Constraint: hi <= n_rows - 1, so the highest slot written (hi-1)
    stays clear of the slice's sink row (n_rows - 1). A single-segment plan
    ([(rows, 1, sims)]) is the unsegmented scan.
    """
    segs = []
    lo = 1
    n = min(min_nodes, rows)
    while lo < sims:
        if n >= rows:
            segs.append((rows, lo, sims))
            break
        hi = min(sims, n - 1)
        if hi > lo:
            segs.append((n, lo, hi))
            lo = hi
        n *= 2
    return segs


def _game_minor_impl(trees, walk_impl: str):
    """Return the kernel mode ('pallas'/'pallas_interpret') when the
    fresh-tree search should run in the persistent game-minor TreeT layout,
    else None. Requires BOTH kernels eligible (they are the only consumers
    that care about layout; the gate is the stricter walk gate)."""
    wi = _pick_walk_impl(trees, walk_impl)
    if wi not in ("pallas", "pallas_interpret"):
        return None
    if _pick_backup_impl(trees, walk_impl) != wi:
        return None
    return wi


def _simulate_step_t(env, tt, spec, eval_fn, rng, add_root_noise,
                     add_root_temp, root_adjust: bool, interpret: bool,
                     uniform_slot, expand_root_only: bool = False):
    """Game-minor twin of simulate_step (TreeT layout, fresh trees only).

    Identical semantics AND identical per-game RNG draws as the batch-major
    uniform-slot path — only the array layout (and therefore the write
    shapes) differ. See mcts/tree_t.py.
    """
    from alphazero_general_tpu.mcts import tree_t as TT
    from alphazero_general_tpu.ops.backup import backup_batched_t
    from alphazero_general_tpu.ops.descend import descend_batched_t

    B = tt.leaf.shape[0]
    _, rng_noise = jax.random.split(rng)  # same split as simulate_step

    if expand_root_only:
        tt, obs, leaf_e, leaf_valids = TT.expand_root_t(env, tt)
    else:
        node, action, child, depth, skip_walk, p_sel = descend_batched_t(
            tt, spec, interpret=interpret)
        tt, obs, leaf_e, leaf_valids = TT.apply_walk_observe_t(
            env, tt, node, action, child, depth, skip_walk, p_sel,
            uniform_slot)

    pi, value = eval_fn(obs)
    is_term = jnp.any(leaf_e > 0, axis=-1, keepdims=True)
    values = jnp.where(is_term, leaf_e, value)
    tt = TT.install_prior_t(tt, pi, spec, jax.random.split(rng_noise, B),
                            add_root_noise, add_root_temp, root_adjust,
                            uniform_slot, leaf_valids)
    return backup_batched_t(tt, values, spec, interpret=interpret)


def _round_step_t(env, tt, spec, eval_fn, keys, slots, K: int,
                  add_root_noise, add_root_temp, interpret: bool):
    """One multi-leaf round on a TreeT: K walks (each allocating its own
    uniform slot), ONE network call over the K·B stacked leaf observations,
    then K prior-installs + backups.

    Round-mates don't see each other's values (the classic virtual-loss
    trade); diversification comes from pending children scoring q=0 and the
    walk stopping at them (tree.descend). Pending-leaf walks re-evaluate
    the same state as their round-mate — duplicate net work, identical
    backed-up statistics to two sequential sims visiting the same node.
    """
    from alphazero_general_tpu.mcts import tree_t as TT
    from alphazero_general_tpu.ops.backup import backup_batched_t
    from alphazero_general_tpu.ops.descend import descend_batched_t

    B = tt.leaf.shape[0]
    obs_l, e_l, valid_l, leaf_l, depth_l = [], [], [], [], []
    for i in range(K):
        node, action, child, depth, skip_walk, p_sel = descend_batched_t(
            tt, spec, interpret=interpret)
        tt, obs, e_leaf, lv = TT.apply_walk_observe_t(
            env, tt, node, action, child, depth, skip_walk, p_sel,
            slots[i], multi_leaf=True)
        obs_l.append(obs)
        e_l.append(e_leaf)
        valid_l.append(lv)
        leaf_l.append(tt.leaf)
        depth_l.append(tt.depth)

    pi, value = eval_fn(jnp.concatenate(obs_l, axis=0))
    for i in range(K):
        pi_i = jax.lax.dynamic_slice_in_dim(pi, i * B, B, axis=0)
        v_i = jax.lax.dynamic_slice_in_dim(value, i * B, B, axis=0)
        is_term = jnp.any(e_l[i] > 0, axis=-1, keepdims=True)
        values = jnp.where(is_term, e_l[i], v_i)
        tt = tt.replace(leaf=leaf_l[i], depth=depth_l[i])
        tt = TT.install_prior_t(tt, pi_i, spec, jax.random.split(keys[i], B),
                                add_root_noise, add_root_temp,
                                root_adjust=False, slot=slots[i],
                                leaf_valids=valid_l[i])
        tt = backup_batched_t(tt, values, spec, interpret=interpret)
    return tt


def _search_t(env, trees, spec, eval_fn, sims: int, rng, add_root_noise,
              add_root_temp, interpret: bool, leaf_batch: int = 1):
    """Fresh-tree search in the persistent game-minor layout. Mirrors the
    fresh branch of :func:`search` (same RNG threading) and converts
    Tree ↔ TreeT once per search. ``leaf_batch`` > 1 evaluates that many
    leaves per network call (multi-leaf rounds — see :func:`_round_step_t`;
    segmentation is skipped in that mode)."""
    from alphazero_general_tpu.mcts import tree_t as TT

    tt = TT.tree_to_tree_t(trees)
    rng_first, rng_rest = jax.random.split(rng)
    tt = _simulate_step_t(
        env, tt, spec, eval_fn, rng_first, add_root_noise, add_root_temp,
        root_adjust=True, interpret=interpret, uniform_slot=jnp.int32(0),
        expand_root_only=True,
    )
    if sims <= 1:
        return TT.tree_t_to_tree(tt)

    def body(tt, xs):
        r, slot = xs
        tt = _simulate_step_t(
            env, tt, spec, eval_fn, r, add_root_noise, add_root_temp,
            root_adjust=False, interpret=interpret, uniform_slot=slot,
        )
        return tt, None

    keys = jax.random.split(rng_rest, sims - 1)
    slots = jnp.arange(1, sims, dtype=jnp.int32)

    if leaf_batch > 1:
        K = leaf_batch
        rounds = (sims - 1) // K
        if rounds:
            def round_body(tt, xs):
                ks, sl = xs  # [K, 2] keys, [K] slots
                tt = _round_step_t(env, tt, spec, eval_fn, ks, sl, K,
                                   add_root_noise, add_root_temp, interpret)
                return tt, None

            xs = (keys[:rounds * K].reshape(rounds, K, 2),
                  slots[:rounds * K].reshape(rounds, K))
            tt, _ = jax.lax.scan(round_body, tt, xs)
        if (sims - 1) % K:  # remainder sims run singly
            tt, _ = jax.lax.scan(
                body, tt, (keys[rounds * K:], slots[rounds * K:]))
        return TT.tree_t_to_tree(tt)

    # Growing-arena segmented scan: identical per-sim RNG keys and slots as
    # one flat scan — only the (leading-row) buffer extents differ.
    rows = tt.parent.shape[0]
    for n, lo, hi in _segment_plan(sims, rows):
        part = TT.slice_rows_t(tt, n) if n < rows else tt
        part, _ = jax.lax.scan(body, part,
                               (keys[lo - 1:hi - 1], slots[lo - 1:hi - 1]))
        tt = TT.merge_rows_t(tt, part) if n < rows else part
    return TT.tree_t_to_tree(tt)


def search(env, trees, spec: T.SearchSpec, eval_fn: EvalFn, sims: int,
           rng: jnp.ndarray, add_root_noise=None, add_root_temp=None,
           walk_impl: str = "auto", fresh_tree: bool = True,
           leaf_batch: int = 1):
    """Run ``sims`` simulation rounds (reference: MCTS.pyx:165-173).

    ``sims`` must be static (scan length). With a fresh tree per move the
    root can only be the leaf on the first simulation, so only that one
    carries the root-noise/temperature trace (MCTS.pyx:247-256).

    ``fresh_tree=True`` (static) asserts ``trees`` has never been searched
    (n[root] == 0 for every game) and enables the uniform-slot write path:
    simulation k allocates slot k for every game, so the per-sim big-row
    writes are dynamic-update-slices, not scatters. Pass ``False`` for
    trees carried across moves (tree reuse / reroot).

    ``leaf_batch`` (static) > 1 evaluates that many leaves per network call
    (multi-leaf rounds, virtual-loss style — a deliberate departure from the
    reference's 1-leaf-per-step semantics, see _round_step_t). Supported on
    the fresh-tree game-minor kernel path; other paths run leaf_batch=1.
    """
    # Uniform slots need one slot per simulation (plus root and the dummy
    # sink); degrade gracefully to the general path on undersized arenas.
    fresh_tree = fresh_tree and sims <= trees.n.shape[1] - 1
    if fresh_tree:
        impl_t = _game_minor_impl(trees, walk_impl)
        if impl_t is not None:
            return _search_t(env, trees, spec, eval_fn, sims, rng,
                             add_root_noise, add_root_temp,
                             interpret=impl_t == "pallas_interpret",
                             leaf_batch=leaf_batch)
    # Pin the kernel choices on the FULL arena shape: a sliced segment must
    # never flip to a different implementation than its sibling segments
    # (the impls agree semantically but are only pinned byte-identical by
    # CPU interpret tests, not across TPU kernel/XLA variants).
    walk_pick = _pick_walk_impl(trees, walk_impl)
    backup_pick = _pick_backup_impl(trees, walk_impl)

    rng_first, rng_rest = jax.random.split(rng)
    trees = simulate_step(
        env, trees, spec, eval_fn, rng_first, add_root_noise, add_root_temp,
        root_adjust=True, walk_impl=walk_pick, backup_impl=backup_pick,
        uniform_slot=jnp.int32(0) if fresh_tree else None,
        expand_root_only=fresh_tree,
    )
    if sims <= 1:
        return trees

    if fresh_tree:
        def body(trees, xs):
            r, slot = xs
            trees = simulate_step(
                env, trees, spec, eval_fn, r, add_root_noise, add_root_temp,
                root_adjust=False, walk_impl=walk_pick,
                backup_impl=backup_pick, uniform_slot=slot,
            )
            return trees, None

        # Growing-arena segmented scan (see _segment_plan / _search_t).
        keys = jax.random.split(rng_rest, sims - 1)
        slots = jnp.arange(1, sims, dtype=jnp.int32)
        rows = trees.parent.shape[1]
        for n, lo, hi in _segment_plan(sims, rows):
            part = T.slice_batched_rows(trees, n) if n < rows else trees
            part, _ = jax.lax.scan(
                body, part, (keys[lo - 1:hi - 1], slots[lo - 1:hi - 1]))
            trees = (T.merge_batched_rows(trees, part)
                     if n < rows else part)
        return trees

    def body(trees, r):
        trees = simulate_step(
            env, trees, spec, eval_fn, r, add_root_noise, add_root_temp,
            root_adjust=False, walk_impl=walk_impl,
        )
        return trees, None

    trees, _ = jax.lax.scan(body, trees, jax.random.split(rng_rest, sims - 1))
    return trees


def uniform_eval_fn(action_size: int, value_size: int,
                    uniform_value: bool = False) -> EvalFn:
    """Model-free evaluation.

    ``uniform_value=False`` → zero values, matching raw_search
    (MCTS.pyx:175-183); ``True`` → uniform value 1/value_size, matching the
    warmup agent (SelfPlayAgent.pyx:48-52).
    """

    def eval_fn(obs):
        B = obs.shape[0]
        pi = jnp.full((B, action_size), 1.0, jnp.float32)
        fill = 1.0 / value_size if uniform_value else 0.0
        value = jnp.full((B, value_size), fill, jnp.float32)
        return pi, value

    return eval_fn


def raw_search(env, states, spec: T.SearchSpec, sims: int, rng: jnp.ndarray,
               capacity: Optional[int] = None, add_root_noise=None,
               add_root_temp=None):
    """Model-free batched search from scratch (MCTS.pyx:175-183)."""
    capacity = capacity or sims + 2
    trees = init_batched_trees(env, states, capacity, spec.value_size)
    eval_fn = uniform_eval_fn(env.ACTION_SIZE, spec.value_size)
    return search(env, trees, spec, eval_fn, sims, rng,
                  add_root_noise, add_root_temp)
