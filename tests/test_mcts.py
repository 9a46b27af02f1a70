"""Array-MCTS tests.

The strongest test is exact parity: a straight-line Python re-statement of the
reference search semantics (alphazero/MCTS.pyx:49-344, float-exponent
discount, root-v deviation documented in mcts/tree.py) is run against the
jitted array tree with an identical deterministic pseudo-network; with noise
and ties absent the visit counts must match exactly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_general_tpu.envs.connect4 import Connect4
import alphazero_general_tpu.mcts.search as S
import alphazero_general_tpu.mcts.tree as T

DRAW_VALUE = 0.5


# ---------------------------------------------------------------------------
# Python mirror of the reference algorithm over the functional env
# ---------------------------------------------------------------------------

class PyNode:
    def __init__(self, action, value_size):
        self.children = []
        self.a = action
        self.e = np.zeros(value_size, np.float32)
        self.q = 0.0
        self.v = 0.0
        self.n = 0
        self.p = 0.0
        self.player = 0
        self.state = None


class PyMCTS:
    """Reference-semantics node MCTS (no shuffle, no noise, no root temp)."""

    def __init__(self, env, spec: T.SearchSpec):
        self.env = env
        self.spec = spec
        self.value_size = spec.value_size
        self.root = PyNode(-1, self.value_size)
        self.max_depth = 0

    def _uct(self, child, sqrt_parent_n, fpu_value):
        val = fpu_value if child.n == 0 else child.q
        return val + self.spec.cpuct * child.p * sqrt_parent_n / (1 + child.n)

    def _best_child(self, node):
        seen = sum(c.p for c in node.children if c.n > 0)
        fpu = node.v - self.spec.fpu_reduction * math.sqrt(seen)
        sqrt_n = math.sqrt(node.n)
        return max(node.children, key=lambda c: self._uct(c, sqrt_n, fpu))

    def find_leaf(self, state):
        self.depth = 0
        node = self.root
        self.path = []
        if node.state is None:
            node.state = state
        st = node.state
        while node.n > 0 and not node.e.any():
            self.path.append(node)
            node = self._best_child(node)
            if node.state is None:
                node.state = self.env.step(st, node.a)
            st = node.state
            self.depth += 1
        if self.depth > self.max_depth:
            self.max_depth = self.depth
        if node.n == 0:
            node.player = int(st.player)
            node.e = np.asarray(self.env.win_state(st))
            valids = np.asarray(self.env.valid_moves(st))
            node.children = [
                PyNode(a, self.value_size) for a in range(len(valids)) if valids[a]
            ]
        self.leaf = node
        return st

    def _get_value(self, vec, player):
        P = self.spec.num_players
        v = vec[player]
        if self.spec.has_draw:
            v += vec[P] / P
        return float(v)

    def process_results(self, value, pi):
        node = self.leaf
        if node.e.any():
            value = node.e.astype(np.float32)
        else:
            valids = np.zeros(self.env.ACTION_SIZE, np.float32)
            for c in node.children:
                valids[c.a] = 1
            pi = pi * valids
            pi = pi / pi.sum()
            for c in node.children:
                c.p = pi[c.a]

        i = 0
        cur = node
        while self.path:
            parent = self.path.pop()
            v = self._get_value(value, parent.player)
            discount = self.spec.min_discount ** (i / max(self.max_depth, 1))
            if v < DRAW_VALUE:
                discount = 2 - discount
            elif v == DRAW_VALUE:
                discount = 1
            cur.q = (cur.q * cur.n + v * discount) / (cur.n + 1)
            if cur.n == 0:
                cur.v = self._get_value(value, cur.player)
            cur.n += 1
            cur = parent
            i += 1
        if self.root.n == 0:
            self.root.v = self._get_value(value, self.root.player)
        self.root.n += 1

    def counts(self):
        out = np.zeros(self.env.ACTION_SIZE, np.int32)
        for c in self.root.children:
            out[c.a] = c.n
        return out


# ---------------------------------------------------------------------------
# Deterministic pseudo-network (identical on both sides, no ties)
# ---------------------------------------------------------------------------

def pseudo_net(obs):
    """obs [B, C, H, W] -> (pi [B, A], value [B, 3]); smooth deterministic."""
    obs = jnp.asarray(obs, jnp.float32)
    B = obs.shape[0]
    flat = obs.reshape(B, -1)
    w = jnp.sin(jnp.arange(flat.shape[1], dtype=jnp.float32)[:, None]
                * jnp.arange(1, 8)[None, :] * 0.37)
    logits = flat @ w  # [B, 7]
    pi = jax.nn.softmax(logits, axis=-1)
    vw = jnp.cos(jnp.arange(flat.shape[1], dtype=jnp.float32)[:, None]
                 * jnp.array([0.11, 0.23, 0.31])[None, :])
    value = jax.nn.softmax(flat @ vw, axis=-1)
    return pi, value


SPEC = T.SearchSpec(
    cpuct=1.25, fpu_reduction=0.2, min_discount=0.8,
    add_root_noise=False, add_root_temp=False,
    num_players=2, has_draw=True,
    tie_noise=0.0,  # mirror is noise-free; pseudo-net produces no ties
)


def run_jax_search(states, sims, spec=SPEC, eval_fn=pseudo_net):
    trees = S.init_batched_trees(Connect4, states, sims + 2, spec.value_size)
    rng = jax.random.PRNGKey(0)
    trees = S.search(Connect4, trees, spec, eval_fn, sims, rng)
    return trees


def batch_states(move_lists):
    def from_moves(moves):
        s = Connect4.init()
        for m in moves:
            s = Connect4.step(s, m)
        return s

    states = [from_moves(m) for m in move_lists]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


class TestParityWithReferenceSemantics:
    @pytest.mark.parametrize("moves", [
        [], [3], [3, 3, 4], [0, 1, 2, 3, 4, 5], [3, 4, 3, 4, 2, 5, 1],
    ])
    def test_counts_match_python_mirror(self, moves):
        sims = 60
        states = batch_states([moves])
        trees = run_jax_search(states, sims)
        jax_counts = np.asarray(jax.vmap(T.counts)(trees))[0]

        py = PyMCTS(Connect4, SPEC)
        s = Connect4.init()
        for m in moves:
            s = Connect4.step(s, m)
        for _ in range(sims):
            st = py.find_leaf(s)
            obs = Connect4.observation(st)
            pi, v = pseudo_net(obs[None])
            py.process_results(np.asarray(v[0]), np.asarray(pi[0]))

        np.testing.assert_array_equal(jax_counts, py.counts())
        # Root visit bookkeeping: root.n == sims (MCTS.pyx:289).
        assert int(trees.n[0, 0]) == sims
        assert jax_counts.sum() == sims - 1  # first sim expands the root

    def test_root_q_matches(self):
        sims = 80
        states = batch_states([[3, 2]])
        trees = run_jax_search(states, sims)
        py = PyMCTS(Connect4, SPEC)
        s = Connect4.init()
        s = Connect4.step(s, 3)
        s = Connect4.step(s, 2)
        for _ in range(sims):
            st = py.find_leaf(s)
            pi, v = pseudo_net(Connect4.observation(st)[None])
            py.process_results(np.asarray(v[0]), np.asarray(pi[0]))

        # Compare q of each root child (derived from parent links).
        children = np.asarray(
            jax.vmap(lambda t: T.child_row(t, T.ROOT)[0])(trees)[0]
        )
        qs = np.asarray(trees.q[0])
        for c in py.root.children:
            if c.n > 0:
                assert children[c.a] >= 0
                np.testing.assert_allclose(qs[children[c.a]], c.q, rtol=1e-4)


class TestSearchBehavior:
    def test_finds_immediate_win(self):
        # Player 0 has three in a row on the bottom at cols 2,3,4 → col 5 or 1
        # wins. Raw (uniform-prior) search must pile visits on a winning move.
        moves = [2, 0, 3, 0, 4, 1]  # p0: 2,3,4 bottom; p1: 0,0,1
        states = batch_states([moves])
        spec = SPEC._replace(min_discount=1.0)
        rng = jax.random.PRNGKey(7)
        trees = S.raw_search(Connect4, states, spec, 200, rng)
        best = int(jax.vmap(T.best_action)(trees)[0])
        assert best in (1, 5), f"expected winning col 1 or 5, got {best}"

    @pytest.mark.slow
    def test_blocks_immediate_loss(self):
        # Player 1 to move; player 0 threatens 4-in-a-row only at col 3
        # (4,5,6 occupied, wall on the right). Uniform-value eval (the warmup
        # agent's evaluation, SelfPlayAgent.pyx:48-52) gives a 0.5 baseline so
        # the losing non-blocking moves score below it.
        moves = [4, 0, 5, 0, 6]
        states = batch_states([moves])
        spec = SPEC._replace(min_discount=1.0)
        trees = S.init_batched_trees(Connect4, states, 302, spec.value_size)
        eval_fn = S.uniform_eval_fn(7, 3, uniform_value=True)
        trees = S.search(Connect4, trees, spec, eval_fn, 300,
                         jax.random.PRNGKey(3))
        best = int(jax.vmap(T.best_action)(trees)[0])
        assert best == 3, f"expected blocking col 3, got {best}"

    def test_temp_zero_is_onehot(self):
        states = batch_states([[3]])
        trees = run_jax_search(states, 40)
        p = np.asarray(jax.vmap(lambda t: T.probs(t, 0.0))(trees))[0]
        assert p.max() == 1.0 and p.sum() == 1.0

    def test_probs_temperature(self):
        states = batch_states([[3]])
        spec = SPEC._replace(min_discount=1.0)
        trees = S.raw_search(Connect4, states, spec, 100, jax.random.PRNGKey(11))
        p1 = np.asarray(jax.vmap(lambda t: T.probs(t, 1.0))(trees))[0]
        p_cold = np.asarray(jax.vmap(lambda t: T.probs(t, 0.25))(trees))[0]
        np.testing.assert_allclose(p1.sum(), 1.0, rtol=1e-5)
        np.testing.assert_allclose(p_cold.sum(), 1.0, rtol=1e-5)
        # Colder temperature concentrates mass.
        assert p_cold.max() > p1.max()
        # temp=1 probs equal the count distribution.
        c = np.asarray(jax.vmap(T.counts)(trees))[0].astype(np.float64)
        np.testing.assert_allclose(p1, c / c.sum(), atol=1e-5)

    def test_root_noise_changes_priors(self):
        states = batch_states([[]])
        spec = SPEC._replace(add_root_noise=True, root_noise_frac=0.5)
        trees_noise = run_jax_search(states, 30, spec=spec)
        trees_clean = run_jax_search(states, 30)
        prior_n = np.asarray(trees_noise.prior[0][:7])
        prior_c = np.asarray(trees_clean.prior[0][:7])
        assert not np.allclose(prior_n, prior_c)
        np.testing.assert_allclose(prior_n.sum(), 1.0, rtol=1e-4)

    def test_root_temp_flattens_prior(self):
        states = batch_states([[3, 4, 3]])
        spec = SPEC._replace(add_root_temp=True, root_policy_temp=4.0)
        trees_t = run_jax_search(states, 20, spec=spec)
        trees_c = run_jax_search(states, 20)
        pt = np.asarray(trees_t.prior[0][:7])
        pc = np.asarray(trees_c.prior[0][:7])
        assert pt.max() < pc.max()  # flattened

    def test_invalid_moves_never_visited(self):
        # Fill column 3 completely; search must not visit it from the root.
        moves = [3, 3, 3, 3, 3, 3]
        states = batch_states([moves])
        trees = run_jax_search(states, 100)
        cts = np.asarray(jax.vmap(T.counts)(trees))[0]
        assert cts[3] == 0
        assert cts.sum() == 99

    @pytest.mark.slow
    def test_capacity_never_exceeded(self):
        sims = 50
        states = batch_states([[], [3], [3, 4]])
        trees = run_jax_search(states, sims)
        assert int(jnp.max(trees.next_free)) <= sims + 2

    @pytest.mark.slow
    def test_batched_independence(self):
        """Batched search must equal per-game search (same seeds aside)."""
        sims = 40
        states_a = batch_states([[3, 2], [0, 1]])
        trees = run_jax_search(states_a, sims)
        counts_batch = np.asarray(jax.vmap(T.counts)(trees))
        for i, mv in enumerate([[3, 2], [0, 1]]):
            single = run_jax_search(batch_states([mv]), sims)
            np.testing.assert_array_equal(
                counts_batch[i], np.asarray(jax.vmap(T.counts)(single))[0]
            )

    @pytest.mark.slow
    def test_fresh_path_matches_general_on_terminal_revisits(self):
        """The fresh-tree uniform-slot path must back up the STORED terminal
        vector on terminal-child revisits, exactly like the general path's
        resolve_value (MCTS.pyx:234-235). Regression: it used to re-step the
        terminal state, which can flip the winner (the losing side completing
        a line on an already-won board)."""
        # Near-terminal positions: many sims end at terminal children.
        moves = [[2, 0, 3, 0, 4, 1], [0, 1, 0, 1, 0, 1], [3, 3, 2, 2, 4, 4]]
        states = batch_states(moves)
        spec = SPEC._replace(min_discount=1.0)
        rng = jax.random.PRNGKey(11)

        def run(fresh):
            trees = S.init_batched_trees(Connect4, states, 122, 3)
            eval_fn = S.uniform_eval_fn(Connect4.ACTION_SIZE, 3)
            return S.search(Connect4, trees, spec, eval_fn, 120, rng,
                            fresh_tree=fresh)

        t_f = run(True)
        t_g = run(False)
        # Same RNG threading → identical SEARCH SEMANTICS. Node slot
        # numbering differs (the general path skips allocation on terminal
        # revisits, the uniform path burns slot k per sim), so compare the
        # order-independent surface: per-action root visit counts and values.
        np.testing.assert_array_equal(
            np.asarray(jax.vmap(T.counts)(t_f)),
            np.asarray(jax.vmap(T.counts)(t_g)),
        )
        nf, qf = jax.vmap(T._root_child_stats)(t_f)
        ng, qg = jax.vmap(T._root_child_stats)(t_g)
        np.testing.assert_array_equal(np.asarray(nf), np.asarray(ng))
        np.testing.assert_allclose(np.asarray(qf), np.asarray(qg),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(jax.vmap(T.root_value)(t_f)),
            np.asarray(jax.vmap(T.root_value)(t_g)), rtol=1e-6)

    @pytest.mark.slow
    def test_terminal_root_value_backup(self):
        """A search whose second move hits terminal states must not corrupt
        counts; terminal leaves re-back-up their fixed result
        (MCTS.pyx:234-235)."""
        # Position one move from a player-0 win at col 1 or 5.
        moves = [2, 0, 3, 0, 4, 1]
        states = batch_states([moves])
        spec = SPEC._replace(min_discount=1.0)
        trees = S.raw_search(Connect4, states, spec, 150, jax.random.PRNGKey(5))
        cts = np.asarray(jax.vmap(T.counts)(trees))[0]
        assert cts.sum() == 149
        # Root value should be near a win for player 0 (the mover).
        rv = float(jax.vmap(lambda t: T.root_value(t))(trees)[0])
        assert rv > 0.9
