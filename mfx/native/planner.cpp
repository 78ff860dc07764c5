// Native epoch planner — the host-side hot loop (SURVEY.md §3.3 #2).
//
// Single-pass counting-sort construction of the DSGD sweep plans consumed
// by the Pallas kernel (mfx/kernels/blocked_host.py documents the layout),
// and the greedy conflict-free round assignment (C5). The NumPy planner is
// O(n log n) with several large temporaries (~60 s for 25M ratings on a
// single-core host); this is O(n) with one random-access pass (phase A
// materializes permutation-ordered locals) and sequential fill passes.
// Exposed via ctypes (mfx/native/__init__.py) with a pure-NumPy fallback.
//
// Plan layout contract (must match blocked_host.SweepPlan):
//   - sweep s covers item windows [s*nwin, min((s+1)*nwin, C))
//   - within a sweep, tiles run user-block-major (a asc, window asc,
//     permutation order within a stratum)
//   - each user block's tile run is padded to a multiple of tpg
//   - tl[t] = {u_local[T], i_windowlocal[T], bitcast(rating)[T]},
//     pad slots = {su, si, 0}

#include <cstdint>
#include <cstring>

extern "C" {

// Phase A: one random-access pass — stratum counts plus permutation-ordered
// per-rating records (sweep id, stratum-in-sweep prefixless ids, locals).
// counts: int64[A*C] (zeroed here). out_nt/out_ng: int64[n_sweeps].
// a_ord/c_ord: int32[n] block ids in perm order; ul/il/rb: locals in perm
// order (rb = rating bits).
int mfx_plan_count(
    int64_t n,
    const int32_t* user,
    const int32_t* item,
    const float* rating,
    const int64_t* perm,
    int64_t num_users, int64_t num_items,
    int64_t su, int64_t si, int64_t tile, int64_t tpg, int64_t nwin,
    int64_t* counts,
    int64_t* out_nt, int64_t* out_ng,
    int32_t* a_ord, int32_t* c_ord,
    int32_t* ul, int32_t* il, int32_t* rb) {
  const int64_t A = (num_users + su - 1) / su;
  const int64_t C = (num_items + si - 1) / si;
  const int64_t S = (C + nwin - 1) / nwin;
  std::memset(counts, 0, sizeof(int64_t) * A * C);
  const int32_t* rbits = reinterpret_cast<const int32_t*>(rating);
  for (int64_t k = 0; k < n; ++k) {
    const int64_t idx = perm ? perm[k] : k;
    const int32_t u = user[idx];
    const int32_t i = item[idx];
    const int32_t a = u / (int32_t)su;
    const int32_t c = i / (int32_t)si;
    counts[(int64_t)a * C + c]++;
    a_ord[k] = a;
    c_ord[k] = c;
    ul[k] = u - a * (int32_t)su;
    il[k] = i - c * (int32_t)si;
    rb[k] = rbits[idx];
  }
  for (int64_t s = 0; s < S; ++s) {
    const int64_t w0 = s * nwin;
    const int64_t w1 = (s + 1) * nwin < C ? (s + 1) * nwin : C;
    int64_t nt = 0;
    for (int64_t a = 0; a < A; ++a) {
      int64_t real = 0;
      for (int64_t c = w0; c < w1; ++c)
        real += (counts[a * C + c] + tile - 1) / tile;
      nt += ((real + tpg - 1) / tpg) * tpg;
    }
    out_nt[s] = nt;
    out_ng[s] = nt / tpg;
  }
  return 0;
}

// Phase B: fill one sweep's arrays from the phase-A records (sequential).
int mfx_plan_fill_sweep(
    int64_t n,
    const int32_t* a_ord, const int32_t* c_ord,
    const int32_t* ul, const int32_t* il, const int32_t* rb,
    int64_t num_users, int64_t num_items,
    int64_t su, int64_t si, int64_t tile, int64_t tpg, int64_t nwin,
    int64_t sweep,
    const int64_t* counts,        // A*C from phase A (not modified)
    int64_t* strat_base_scratch,  // A*nwin
    int64_t* strat_pos_scratch,   // A*nwin (zeroed here)
    int32_t* sa, int32_t* tc, int32_t* tl,
    int64_t nt) {
  const int64_t A = (num_users + su - 1) / su;
  const int64_t C = (num_items + si - 1) / si;
  const int64_t w0 = sweep * nwin;
  const int64_t w1 = (sweep + 1) * nwin < C ? (sweep + 1) * nwin : C;
  const int64_t nw = w1 - w0;
  const int64_t T = tile;

  // tile base per stratum, with per-a padding to tpg
  int64_t base = 0;
  for (int64_t a = 0; a < A; ++a) {
    const int64_t a_first_tile = base;
    for (int64_t c = 0; c < nw; ++c) {
      strat_base_scratch[a * nw + c] = base;
      base += (counts[a * C + w0 + c] + T - 1) / T;
    }
    const int64_t real = base - a_first_tile;
    base = a_first_tile + ((real + tpg - 1) / tpg) * tpg;
    for (int64_t g = a_first_tile / tpg; g < base / tpg; ++g) sa[g] = (int32_t)a;
  }
  if (base != nt) return 1;  // plan size mismatch

  // pad-fill tl and tc
  for (int64_t t = 0; t < nt; ++t) {
    int32_t* row = tl + t * 3 * T;
    for (int64_t x = 0; x < T; ++x) row[x] = (int32_t)su;
    for (int64_t x = 0; x < T; ++x) row[T + x] = (int32_t)si;
    std::memset(row + 2 * T, 0, sizeof(int32_t) * T);
    tc[t] = 0;
  }
  for (int64_t a = 0; a < A; ++a)
    for (int64_t c = 0; c < nw; ++c) {
      const int64_t cnt = counts[a * C + w0 + c];
      const int64_t tb = strat_base_scratch[a * nw + c];
      for (int64_t t = 0; t < (cnt + T - 1) / T; ++t) tc[tb + t] = (int32_t)c;
    }

  std::memset(strat_pos_scratch, 0, sizeof(int64_t) * A * nw);
  for (int64_t k = 0; k < n; ++k) {
    const int64_t c_glob = c_ord[k];
    if (c_glob < w0 || c_glob >= w1) continue;
    const int64_t sidx = (int64_t)a_ord[k] * nw + (c_glob - w0);
    const int64_t pos = strat_pos_scratch[sidx]++;
    int32_t* row = tl + (strat_base_scratch[sidx] + pos / T) * 3 * T;
    const int64_t slot = pos % T;
    row[slot] = ul[k];
    row[T + slot] = il[k];
    row[2 * T + slot] = rb[k];
  }
  return 0;
}

// Greedy conflict-free round assignment (C5): round[j] for the j-th rating
// in perm order, such that no two ratings in a round share a user or item.
// Rounds are <= max degree (Vizing-style greedy). O(n).
int mfx_conflict_free_rounds(
    int64_t n,
    const int32_t* user,
    const int32_t* item,
    const int64_t* perm,
    int64_t num_users, int64_t num_items,
    int32_t* next_u, int32_t* next_i,
    int32_t* out_round) {
  std::memset(next_u, 0, sizeof(int32_t) * num_users);
  std::memset(next_i, 0, sizeof(int32_t) * num_items);
  int32_t max_round = 0;
  for (int64_t k = 0; k < n; ++k) {
    const int64_t idx = perm ? perm[k] : k;
    const int32_t u = user[idx];
    const int32_t i = item[idx];
    int32_t r = next_u[u] > next_i[i] ? next_u[u] : next_i[i];
    out_round[k] = r;
    next_u[u] = r + 1;
    next_i[i] = r + 1;
    if (r > max_round) max_round = r;
  }
  return max_round + 1;
}

}  // extern "C"
