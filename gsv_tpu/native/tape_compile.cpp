// Native helpers for the tape compiler's sequential hot loops.
//
// The circuit compiler (gsv_tpu/circuit/tape.py) flattens templates into
// gate arrays and schedules them into topological waves with register
// allocation.  Three loops are inherently sequential (per-gate dependencies)
// and dominate compile time for billion-gate circuits in Python; they live
// here instead.  Built on demand via g++ (see native/__init__.py); the
// Python implementations remain as fallback.
//
// This is the TPU build's analogue of the reference keeping its metadata
// pass in Rust (src/circuit/component_meta.rs): the per-gate compile work is
// native, the orchestration stays in Python.

#include <cstddef>
#include <cstdint>
#include <queue>
#include <vector>

extern "C" {

// ASAP levels: gate_level[i] = max(level[a[i]], level[b[i]]) + 1, where
// header wires (constants + inputs) sit at level 0.  Wires are SSA (each c
// written once, before any read).
void compute_levels(int64_t n_gates, const int64_t* a, const int64_t* b,
                    const int64_t* c, int64_t n_wires, int64_t* gate_level) {
  std::vector<int64_t> wl(static_cast<size_t>(n_wires), 0);
  for (int64_t i = 0; i < n_gates; ++i) {
    int64_t la = wl[a[i]];
    int64_t lb = wl[b[i]];
    int64_t g = (la > lb ? la : lb) + 1;
    gate_level[i] = g;
    wl[c[i]] = g;
  }
}

// Linear-scan slot allocation over wave order.
//
// Inputs: gates sorted by level via `order` (stable), their output wires `c`,
// per-wire last-read level `last_read` (-1 = never read, INT64_MAX = pinned
// to the end), and per-gate levels. Outputs slot_of[wire] (-1 = none) and
// returns frame_size.
int64_t alloc_slots(int64_t n_gates, const int64_t* order,
                    const int64_t* gate_level, const int64_t* c,
                    const int64_t* last_read, int64_t n_wires,
                    int64_t pin_sentinel, int64_t* slot_of) {
  for (int64_t w = 0; w < n_wires; ++w) slot_of[w] = -1;
  std::priority_queue<int64_t, std::vector<int64_t>, std::greater<int64_t>>
      free_slots;
  // expiry min-heap of (level, slot)
  using LS = std::pair<int64_t, int64_t>;
  std::priority_queue<LS, std::vector<LS>, std::greater<LS>> expiries;
  int64_t frame_size = 0;
  int64_t prev_level = 0;
  for (int64_t k = 0; k < n_gates; ++k) {
    int64_t idx = order[k];
    int64_t g = gate_level[idx];
    if (g != prev_level) {
      while (!expiries.empty() && expiries.top().first <= g) {
        free_slots.push(expiries.top().second);
        expiries.pop();
      }
      prev_level = g;
    }
    int64_t w = c[idx];
    int64_t s;
    if (!free_slots.empty()) {
      s = free_slots.top();
      free_slots.pop();
    } else {
      s = frame_size++;
    }
    slot_of[w] = s;
    int64_t lr = last_read[w];
    if (lr < 0) lr = g;  // write-only: reusable next level
    if (lr != pin_sentinel) expiries.push({lr + 1, s});
  }
  return frame_size;
}

}  // extern "C"
