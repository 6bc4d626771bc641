// Host-side 9x9 Go rules engine (C++), exposed via a C ABI for ctypes.
//
// The device path (bokego_tpu/env/rules.py) is the product's rules engine;
// this library serves the *host* runtime: instant legality checks for GTP
// `play` commands, SGF batch replay/scoring in the match harness, and a
// third independent implementation for parity testing.  Semantics match the
// reference engine exactly (captures before suicide, the single-capture
// surrounded-point ko rule with one-ply lifetime, Tromp-Taylor scoring) —
// see /root/reference/bokego/go.py:109-218 for the behavioral spec.
//
// Build: make -C native   (produces bokego_tpu/native/libgoboard.so)

#include <cstdint>
#include <cstring>

namespace {

constexpr int N = 9;
constexpr int NN = 81;
constexpr int8_t EMPTY = 0, BLACK = 1, WHITE = 2;

struct Neighbors {
  int n[NN][4];
  int count[NN];
  Neighbors() {
    for (int x = 0; x < N; ++x) {
      for (int y = 0; y < N; ++y) {
        int p = N * x + y, c = 0;
        if (x > 0) n[p][c++] = p - N;
        if (x < N - 1) n[p][c++] = p + N;
        if (y > 0) n[p][c++] = p - 1;
        if (y < N - 1) n[p][c++] = p + 1;
        count[p] = c;
      }
    }
  }
};
const Neighbors NBR;

// Flood-fill the chain containing p; returns stone count, sets chain mask,
// and reports whether the chain has any liberty.
int chain_of(const int8_t* board, int p, uint8_t* chain, bool* has_lib) {
  int8_t color = board[p];
  int stack[NN], top = 0, size = 0;
  std::memset(chain, 0, NN);
  *has_lib = false;
  stack[top++] = p;
  chain[p] = 1;
  while (top) {
    int cur = stack[--top];
    ++size;
    for (int k = 0; k < NBR.count[cur]; ++k) {
      int q = NBR.n[cur][k];
      if (board[q] == color && !chain[q]) {
        chain[q] = 1;
        stack[top++] = q;
      } else if (board[q] == EMPTY) {
        *has_lib = true;
      }
    }
  }
  return size;
}

int chain_liberties(const int8_t* board, int p, uint8_t* chain) {
  bool unused;
  chain_of(board, p, chain, &unused);
  uint8_t lib_seen[NN];
  std::memset(lib_seen, 0, NN);
  int libs = 0;
  for (int q = 0; q < NN; ++q) {
    if (!chain[q]) continue;
    for (int k = 0; k < NBR.count[q]; ++k) {
      int r = NBR.n[q][k];
      if (board[r] == EMPTY && !lib_seen[r]) {
        lib_seen[r] = 1;
        ++libs;
      }
    }
  }
  return libs;
}

// Try playing `action` for the side to move; if legal, writes the successor
// into out_board / out_ko and returns the number of captured stones (>= 0).
// Returns -1 if illegal.  (Reference: Game.play_move, go.py:123-182.)
int try_play(const int8_t* board, int ko, int turn, int action,
             int8_t* out_board, int* out_ko) {
  if (action < 0 || action >= NN) return -1;
  if (action == ko) return -1;
  if (board[action] != EMPTY) return -1;
  int8_t color = (turn % 2 == 0) ? BLACK : WHITE;
  int8_t opp = (color == BLACK) ? WHITE : BLACK;

  bool surrounded = true;
  for (int k = 0; k < NBR.count[action]; ++k)
    if (board[NBR.n[action][k]] != opp) surrounded = false;

  std::memcpy(out_board, board, NN);
  out_board[action] = color;

  int captured = 0, last_cap = -1;
  uint8_t chain[NN];
  for (int k = 0; k < NBR.count[action]; ++k) {
    int q = NBR.n[action][k];
    if (out_board[q] != opp) continue;
    bool has_lib;
    chain_of(out_board, q, chain, &has_lib);
    if (!has_lib) {
      for (int r = 0; r < NN; ++r) {
        if (chain[r]) {
          out_board[r] = EMPTY;
          ++captured;
          last_cap = r;
        }
      }
    }
  }
  bool has_lib;
  chain_of(out_board, action, chain, &has_lib);
  if (!has_lib) return -1;  // suicide
  *out_ko = (captured == 1 && surrounded) ? last_cap : -1;
  return captured;
}

struct Diagonals {
  int d[NN][4];
  int count[NN];
  Diagonals() {
    for (int x = 0; x < N; ++x) {
      for (int y = 0; y < N; ++y) {
        int p = N * x + y, c = 0;
        for (int dx = -1; dx <= 1; dx += 2) {
          for (int dy = -1; dy <= 1; dy += 2) {
            int nx = x + dx, ny = y + dy;
            if (nx >= 0 && nx < N && ny >= 0 && ny < N) d[p][c++] = N * nx + ny;
          }
        }
        count[p] = c;
      }
    }
  }
};
const Diagonals DIAG;

// One-point-eye test for the side `color` (fixed-diagonals possible_eye,
// go.py:470-485 semantics as corrected in env/rules.eye_colors): all
// on-board neighbors are `color`, and faults (off-board diagonal deficit
// counts once, plus each opponent-held diagonal) stay <= 1.
bool is_own_eye(const int8_t* board, int p, int8_t color) {
  if (board[p] != EMPTY) return false;
  for (int k = 0; k < NBR.count[p]; ++k)
    if (board[NBR.n[p][k]] != color) return false;
  int faults = DIAG.count[p] < 4 ? 1 : 0;
  for (int k = 0; k < DIAG.count[p]; ++k) {
    int8_t c = board[DIAG.d[p][k]];
    if (c != EMPTY && c != color) ++faults;
  }
  return faults <= 1;
}

uint64_t xorshift(uint64_t* s) {
  uint64_t x = *s;
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  return *s = x;
}

// Tromp-Taylor per-point area assignment (same reachability as go_score).
void area_colors(const int8_t* board, int8_t* out) {
  uint8_t reach_b[NN], reach_w[NN];
  for (int p = 0; p < NN; ++p) {
    reach_b[p] = board[p] == BLACK;
    reach_w[p] = board[p] == WHITE;
  }
  for (bool changed = true; changed;) {
    changed = false;
    for (int p = 0; p < NN; ++p) {
      if (board[p] != EMPTY) continue;
      for (int k = 0; k < NBR.count[p]; ++k) {
        int q = NBR.n[p][k];
        if (reach_b[q] && !reach_b[p]) { reach_b[p] = 1; changed = true; }
        if (reach_w[q] && !reach_w[p]) { reach_w[p] = 1; changed = true; }
      }
    }
  }
  for (int p = 0; p < NN; ++p) {
    if (board[p] == BLACK || (board[p] == EMPTY && reach_b[p] && !reach_w[p]))
      out[p] = BLACK;
    else if (board[p] == WHITE || (board[p] == EMPTY && reach_w[p] && !reach_b[p]))
      out[p] = WHITE;
    else
      out[p] = EMPTY;
  }
}

// Continue one game with uniform-random legal non-own-eye moves until two
// consecutive passes (or max_steps); color the final board Tromp-Taylor.
void resolve_one(const int8_t* board0, int ko0, int turn0, int max_steps,
                 uint64_t* rng, int8_t* colors_out) {
  int8_t board[NN];
  std::memcpy(board, board0, NN);
  int ko = ko0, turn = turn0, passes = 0;
  int8_t scratch[NN];
  for (int step = 0; step < max_steps && passes < 2; ++step) {
    int8_t color = (turn % 2 == 0) ? BLACK : WHITE;
    // candidates: empty points that are not our own one-point eyes
    int cand[NN], nc = 0;
    for (int p = 0; p < NN; ++p)
      if (board[p] == EMPTY && !is_own_eye(board, p, color)) cand[nc++] = p;
    // Fisher-Yates draw until a legal move plays; pass when none does
    bool played = false;
    for (int i = nc; i > 0 && !played; --i) {
      int j = static_cast<int>(xorshift(rng) % static_cast<uint64_t>(i));
      int p = cand[j];
      cand[j] = cand[i - 1];
      int next_ko;
      int caps = try_play(board, ko, turn, p, scratch, &next_ko);
      if (caps >= 0) {
        std::memcpy(board, scratch, NN);
        ko = next_ko;
        ++turn;
        passes = 0;
        played = true;
      }
    }
    if (!played) {  // pass
      ko = -1;
      ++turn;
      ++passes;
    }
  }
  area_colors(board, colors_out);
}

}  // namespace

extern "C" {

// Dead-group-aware ownership: n_playouts random resolutions from the given
// position, each played to double-pass and Tromp-Taylor colored; a point's
// owner is its strict-majority color (0 when contested).  This replaces the
// reference's external gnugo dead-group judgment (go.py:512-526) with a
// self-contained resolver (see bokego_tpu/env/scoring.py for the device
// twin).  out81: 0 neutral / 1 black / 2 white.
void go_ownership(const int8_t* board, int32_t ko, int32_t turn,
                  int32_t n_playouts, int32_t max_steps, uint64_t seed,
                  int8_t* out81) {
  int votes_b[NN] = {0}, votes_w[NN] = {0};
  uint64_t rng = seed ? seed : 0x9e3779b97f4a7c15ULL;
  int8_t colors[NN];
  for (int g = 0; g < n_playouts; ++g) {
    resolve_one(board, ko, turn, max_steps, &rng, colors);
    for (int p = 0; p < NN; ++p) {
      if (colors[p] == BLACK) ++votes_b[p];
      else if (colors[p] == WHITE) ++votes_w[p];
    }
  }
  for (int p = 0; p < NN; ++p) {
    if (2 * votes_b[p] > n_playouts) out81[p] = BLACK;
    else if (2 * votes_w[p] > n_playouts) out81[p] = WHITE;
    else out81[p] = EMPTY;
  }
}

// Majority-ownership area score: black - white - komi.
float go_resolved_score(const int8_t* board, int32_t ko, int32_t turn,
                        float komi, int32_t n_playouts, int32_t max_steps,
                        uint64_t seed) {
  int8_t owner[NN];
  go_ownership(board, ko, turn, n_playouts, max_steps, seed, owner);
  int b = 0, w = 0;
  for (int p = 0; p < NN; ++p) {
    if (owner[p] == BLACK) ++b;
    else if (owner[p] == WHITE) ++w;
  }
  return static_cast<float>(b) - static_cast<float>(w) - komi;
}

// Play for the side to move. board/ko/turn are mutated on success.
// action: 0..80 point, 81 pass. Returns captures (>=0) or -1 if illegal.
int go_play(int8_t* board, int32_t* ko, int32_t* turn, int32_t action) {
  if (action == NN) {  // pass
    *ko = -1;
    *turn += 1;
    return 0;
  }
  int8_t next[NN];
  int next_ko;
  int caps = try_play(board, *ko, *turn, action, next, &next_ko);
  if (caps < 0) return -1;
  std::memcpy(board, next, NN);
  *ko = next_ko;
  *turn += 1;
  return caps;
}

// Legality of all 81 points for the side to move (out81: 0/1).
void go_legal(const int8_t* board, int32_t ko, int32_t turn, uint8_t* out81) {
  int8_t scratch[NN];
  int k;
  for (int p = 0; p < NN; ++p)
    out81[p] = try_play(board, ko, turn, p, scratch, &k) >= 0 ? 1 : 0;
}

// Per-point group liberty counts (0 at empty points).
void go_liberties(const int8_t* board, int32_t* out81) {
  uint8_t chain[NN], done[NN];
  std::memset(done, 0, NN);
  std::memset(out81, 0, NN * sizeof(int32_t));
  for (int p = 0; p < NN; ++p) {
    if (board[p] == EMPTY || done[p]) continue;
    int libs = chain_liberties(board, p, chain);
    for (int q = 0; q < NN; ++q) {
      if (chain[q]) {
        out81[q] = libs;
        done[q] = 1;
      }
    }
  }
}

// Tromp-Taylor area score: black - white - komi (go.py:202-218).
float go_score(const int8_t* board, float komi) {
  uint8_t reach_b[NN], reach_w[NN];
  for (int p = 0; p < NN; ++p) {
    reach_b[p] = board[p] == BLACK;
    reach_w[p] = board[p] == WHITE;
  }
  for (bool changed = true; changed;) {
    changed = false;
    for (int p = 0; p < NN; ++p) {
      if (board[p] != EMPTY) continue;
      for (int k = 0; k < NBR.count[p]; ++k) {
        int q = NBR.n[p][k];
        if (reach_b[q] && !reach_b[p]) { reach_b[p] = 1; changed = true; }
        if (reach_w[q] && !reach_w[p]) { reach_w[p] = 1; changed = true; }
      }
    }
  }
  int b = 0, w = 0;
  for (int p = 0; p < NN; ++p) {
    if (board[p] == BLACK || (board[p] == EMPTY && reach_b[p] && !reach_w[p])) ++b;
    if (board[p] == WHITE || (board[p] == EMPTY && reach_w[p] && !reach_b[p])) ++w;
  }
  return static_cast<float>(b) - static_cast<float>(w) - komi;
}

// Replay a move sequence from the empty board. moves: host coords
// (PASS = -1). Returns the index of the first illegal move, or -2 on
// success; final position written to board/ko/turn.
int go_replay(const int32_t* moves, int32_t n_moves, int8_t* board,
              int32_t* ko, int32_t* turn) {
  std::memset(board, 0, NN);
  *ko = -1;
  *turn = 0;
  for (int i = 0; i < n_moves; ++i) {
    int32_t a = moves[i] < 0 ? NN : moves[i];
    if (go_play(board, ko, turn, a) < 0) return i;
  }
  return -2;
}

}  // extern "C"
