// azg_native — host-side C++ runtime for alphazero_general_tpu.
//
// The TPU path (JAX/Pallas) owns all batched training/eval compute; this
// library owns the genuinely host-side hot path: low-latency sequential
// search for interactive play and the live analysis evaluator, where per-move
// latency (not throughput) matters and a jitted batched program is the wrong
// tool. It re-implements, in C++, the reference's node-based PUCT search
// semantics (reference: alphazero/MCTS.pyx:49-344 — FPU reduction from seen
// policy, uniform-prior raw search, random tie-breaking) and bundled rules
// for the small built-in games (reference: envs/connect4/Connect4Logic.pyx,
// envs/tictactoe/TicTacToeLogic.py).
//
// Build: g++ -O3 -march=native -shared -fPIC azg_native.cpp -o libazg_native.so
// API: C linkage, ctypes-friendly (see alphazero_general_tpu/ops/native.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <random>
#include <algorithm>

namespace {

constexpr float DRAW_VALUE = 0.5f;

// ---------------------------------------------------------------------------
// Game abstraction (compile-time, no virtual dispatch in the hot loop)
// ---------------------------------------------------------------------------

struct Connect4 {
    static constexpr int H = 6, W = 7, A = 7, PLAYERS = 2, VSIZE = 3;
    int8_t board[H * W];
    int player;  // 0/1
    int turns;

    void load(const int8_t* cells, int player_, int turns_) {
        std::memcpy(board, cells, sizeof(board));
        player = player_;
        turns = turns_;
    }
    int valid_moves(uint8_t* out) const {
        int n = 0;
        for (int c = 0; c < W; ++c) {
            out[c] = board[c] == 0;  // top row empty
            n += out[c];
        }
        return n;
    }
    void step(int action) {
        int filled = 0;
        for (int r = 0; r < H; ++r) filled += board[r * W + action] != 0;
        int row = H - 1 - filled;
        board[row * W + action] = player == 0 ? 1 : -1;
        player ^= 1;
        ++turns;
    }
    // result[3]: p0 win, p1 win, draw; returns true if terminal
    bool win_state(float* result) const {
        result[0] = result[1] = result[2] = 0.f;
        static const int dirs[4][2] = {{0, 1}, {1, 0}, {1, 1}, {1, -1}};
        for (int r = 0; r < H; ++r)
            for (int c = 0; c < W; ++c) {
                int8_t v = board[r * W + c];
                if (!v) continue;
                for (auto& d : dirs) {
                    int rr = r + 3 * d[0], cc = c + 3 * d[1];
                    if (rr < 0 || rr >= H || cc < 0 || cc >= W) continue;
                    bool all = true;
                    for (int k = 1; k < 4 && all; ++k)
                        all = board[(r + k * d[0]) * W + c + k * d[1]] == v;
                    if (all) {
                        result[v == 1 ? 0 : 1] = 1.f;
                        return true;
                    }
                }
            }
        for (int c = 0; c < W; ++c)
            if (board[c] == 0) return false;
        result[2] = 1.f;
        return true;
    }
};

struct TicTacToe {
    static constexpr int H = 3, W = 3, A = 9, PLAYERS = 2, VSIZE = 3;
    int8_t board[9];
    int player;
    int turns;

    void load(const int8_t* cells, int player_, int turns_) {
        std::memcpy(board, cells, sizeof(board));
        player = player_;
        turns = turns_;
    }
    int valid_moves(uint8_t* out) const {
        int n = 0;
        for (int i = 0; i < 9; ++i) {
            out[i] = board[i] == 0;
            n += out[i];
        }
        return n;
    }
    void step(int action) {
        board[action] = player == 0 ? 1 : -1;
        player ^= 1;
        ++turns;
    }
    bool win_state(float* result) const {
        result[0] = result[1] = result[2] = 0.f;
        static const int lines[8][3] = {{0, 1, 2}, {3, 4, 5}, {6, 7, 8},
                                        {0, 3, 6}, {1, 4, 7}, {2, 5, 8},
                                        {0, 4, 8}, {2, 4, 6}};
        for (auto& L : lines) {
            int8_t v = board[L[0]];
            if (v && board[L[1]] == v && board[L[2]] == v) {
                result[v == 1 ? 0 : 1] = 1.f;
                return true;
            }
        }
        for (int i = 0; i < 9; ++i)
            if (!board[i]) return false;
        result[2] = 1.f;
        return true;
    }
};

// ---------------------------------------------------------------------------
// Node-based PUCT search (MCTS.pyx semantics, uniform priors / zero values —
// the RawMCTS evaluation, GenericPlayers.py:198-200)
// ---------------------------------------------------------------------------

struct Node {
    int32_t first_child = -1;  // index into node pool
    int16_t num_children = 0;
    int16_t action = -1;
    int32_t n = 0;
    float q = 0.f;
    float v = 0.f;
    float p = 0.f;
    int8_t player = 0;
    bool terminal = false;
    float e[4] = {0, 0, 0, 0};
};

struct SearchParams {
    int sims;
    float cpuct;
    float fpu_reduction;
    float min_discount;
    uint32_t seed;
};

template <typename Game>
struct Search {
    std::vector<Node> pool;
    std::mt19937 rng;
    float value_vec[4];
    int max_depth = 0;

    explicit Search(uint32_t seed) : rng(seed) { pool.reserve(1 << 16); }

    int select_child(const Node& nd) {
        // FPU from seen policy (MCTS.pyx:89-104); uniform tiny tiebreak.
        float seen = 0.f;
        for (int i = 0; i < nd.num_children; ++i) {
            const Node& c = pool[nd.first_child + i];
            if (c.n > 0) seen += c.p;
        }
        float fpu = nd.v - /*fpu_reduction*/ fpu_red * std::sqrt(seen);
        float sqrt_n = std::sqrt((float)nd.n);
        float best = -1e30f;
        int best_i = 0;
        std::uniform_real_distribution<float> U(0.f, 1e-6f);
        for (int i = 0; i < nd.num_children; ++i) {
            const Node& c = pool[nd.first_child + i];
            float val = c.n == 0 ? fpu : c.q;
            float u = val + cpuct * c.p * sqrt_n / (1.f + c.n) + U(rng);
            if (u > best) { best = u; best_i = i; }
        }
        return best_i;
    }

    float cpuct = 1.25f, fpu_red = 0.2f, min_discount = 1.0f;

    void expand(int ni, const Game& g) {
        uint8_t valids[Game::A];
        int nv = g.valid_moves(valids);
        Node& nd = pool[ni];
        nd.player = (int8_t)g.player;
        float res[4];
        nd.terminal = g.win_state(res);
        std::memcpy(nd.e, res, sizeof(res));
        if (nd.terminal) return;
        nd.first_child = (int32_t)pool.size();
        nd.num_children = 0;
        float p = nv ? 1.f / nv : 0.f;
        for (int a = 0; a < Game::A; ++a) {
            if (!valids[a]) continue;
            Node c;
            c.action = (int16_t)a;
            c.p = p;  // uniform priors (raw search, MCTS.pyx:175-183)
            pool.push_back(c);
            ++pool[ni].num_children;
        }
    }

    float value_for(const float* vec, int player) const {
        return vec[player] + vec[Game::PLAYERS] / Game::PLAYERS;
    }

    void run(const Game& root_state, const SearchParams& sp) {
        cpuct = sp.cpuct;
        fpu_red = sp.fpu_reduction;
        min_discount = sp.min_discount;
        pool.clear();
        pool.emplace_back();
        max_depth = 0;

        std::vector<int> path;
        for (int s = 0; s < sp.sims; ++s) {
            Game g = root_state;
            path.clear();
            int cur = 0;
            while (pool[cur].n > 0 && !pool[cur].terminal) {
                path.push_back(cur);
                int ci = select_child(pool[cur]);
                cur = pool[cur].first_child + ci;
                g.step(pool[cur].action);
            }
            int depth = (int)path.size();
            if (depth > max_depth) max_depth = depth;

            if (pool[cur].n == 0) expand(cur, g);

            const Node& leaf = pool[cur];
            float vec[4] = {0, 0, 0, 0};
            if (leaf.terminal) std::memcpy(vec, leaf.e, sizeof(vec));
            // else: zero values (raw search)

            // Backup with depth discount (MCTS.pyx:260-289).
            int i = 0;
            int node = cur;
            while (!path.empty()) {
                int par = path.back();
                path.pop_back();
                float val = value_for(vec, pool[par].player);
                float frac = max_depth ? (float)i / (float)max_depth : 0.f;
                float disc = std::pow(min_discount, frac);
                if (val < DRAW_VALUE) disc = 2.f - disc;
                else if (val == DRAW_VALUE) disc = 1.f;
                Node& nd = pool[node];
                nd.q = (nd.q * nd.n + val * disc) / (nd.n + 1);
                if (nd.n == 0) nd.v = value_for(vec, nd.player);
                ++nd.n;
                node = par;
                ++i;
            }
            if (pool[0].n == 0) pool[0].v = value_for(vec, pool[0].player);
            ++pool[0].n;
        }
    }

    void counts(int32_t* out, int A) const {
        std::fill(out, out + A, 0);
        const Node& r = pool[0];
        for (int i = 0; i < r.num_children; ++i) {
            const Node& c = pool[r.first_child + i];
            out[c.action] = c.n;
        }
    }

    float root_value() const {
        float best = 0.f;
        const Node& r = pool[0];
        for (int i = 0; i < r.num_children; ++i) {
            const Node& c = pool[r.first_child + i];
            if (c.n > 0 && c.q > best) best = c.q;
        }
        return best;
    }
};

template <typename Game>
int solve(const int8_t* board, int player, int turns, const SearchParams& sp,
          int32_t* out_counts, float* out_value, int32_t* out_depth) {
    Game g;
    g.load(board, player, turns);
    Search<Game> search(sp.seed);
    search.run(g, sp);
    search.counts(out_counts, Game::A);
    *out_value = search.root_value();
    *out_depth = search.max_depth;
    int best = 0;
    for (int a = 1; a < Game::A; ++a)
        if (out_counts[a] > out_counts[best]) best = a;
    return best;
}

}  // namespace

extern "C" {

// game_id: 0 = connect4 (board int8[42]), 1 = tictactoe (board int8[9])
int azg_raw_mcts_solve(int game_id, const int8_t* board, int player,
                       int turns, int sims, float cpuct, float fpu_reduction,
                       float min_discount, uint32_t seed, int32_t* out_counts,
                       float* out_value, int32_t* out_depth) {
    SearchParams sp{sims, cpuct, fpu_reduction, min_discount, seed};
    switch (game_id) {
        case 0:
            return solve<Connect4>(board, player, turns, sp, out_counts,
                                   out_value, out_depth);
        case 1:
            return solve<TicTacToe>(board, player, turns, sp, out_counts,
                                    out_value, out_depth);
        default:
            return -1;
    }
}

int azg_version() { return 1; }

}  // extern "C"
