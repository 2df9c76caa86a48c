// gateway: native dynamic micro-batching request queue for model serving.
//
// The reference serves grounding queries one process-blocking batch at a
// time (grounding/test.py's eval loop); there is no online serving path at
// all. This library is the runtime half of this framework's serving stack:
// concurrent producers submit single (token-id query, video-row) requests
// from any thread; one consumer — the JAX dispatch worker in
// shufflingvideosfortsg_tpu/gateway.py — drains them as deadline-batched
// micro-batches sized for the TPU's jitted serving program, then posts the
// per-request results back. All queueing, batching-deadline, ticket and
// wakeup logic lives here (mutex + condvars, zero Python between submit
// and batch formation), so the GIL-holding Python side only touches full
// batches.
//
// Batching policy (gw_next_batch): block up to first_wait_us for the first
// queued request, then keep accepting stragglers until either max_batch
// requests are in hand or flush_us has elapsed since the first one was
// picked up. This is the standard latency/throughput dial: flush_us=0
// degenerates to "whatever is queued right now", large flush_us to fixed
// full batches.
//
// C ABI (ctypes-friendly; all blocking calls release the GIL by nature of
// being foreign calls):
//   gw_create(capacity, max_tokens, &h)
//   gw_submit(h, tokens, n_tokens, video_row)       -> ticket | -1 full
//                                                       | -2 shutdown
//   gw_next_batch(h, max_batch, first_wait_us, flush_us,
//                 tickets_out, tokens_out, vids_out) -> n | 0 timeout
//                                                       | -1 drained
//   gw_complete(h, tickets, n, starts, ends, scores)
//   gw_wait(h, ticket, timeout_us, &start, &end, &score)
//                                                    -> 0 | -1 timeout
//                                                       | -2 bad ticket
//   gw_stats(h, &submitted, &completed, &batches, &batched_requests)
//   gw_shutdown(h)   (producers rejected; consumer drains, then sees -1)
//   gw_destroy(h)

#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

enum class SlotState : uint8_t { kFree, kQueued, kInflight, kDone };

struct Slot {
  SlotState state = SlotState::kFree;
  uint64_t gen = 0;          // ticket = gen * capacity + index (ABA guard)
  std::vector<int32_t> tokens;
  int32_t n_tokens = 0;
  int32_t video_row = 0;
  float start = 0.f, end = 0.f, score = 0.f;
};

struct Gateway {
  std::mutex mu;
  std::condition_variable queued_cv;   // consumer waits for work
  std::condition_variable done_cv;     // producers wait for results
  std::vector<Slot> slots;
  std::vector<int32_t> fifo;           // ring of queued slot indices
  size_t fifo_head = 0, fifo_len = 0;
  std::vector<int32_t> free_list;
  int64_t capacity = 0;
  int32_t max_tokens = 0;
  bool shutdown = false;
  // stats
  uint64_t submitted = 0, completed = 0, batches = 0, batched_requests = 0;
};

inline int64_t ticket_of(const Gateway* g, int32_t idx) {
  return (int64_t)(g->slots[idx].gen * (uint64_t)g->capacity + idx);
}

// Returns slot index for a live ticket in the wanted state, else -1.
inline int32_t slot_of(Gateway* g, int64_t ticket) {
  if (ticket < 0) return -1;
  int32_t idx = (int32_t)(ticket % g->capacity);
  uint64_t gen = (uint64_t)(ticket / g->capacity);
  if (g->slots[idx].gen != gen) return -1;
  return idx;
}

}  // namespace

extern "C" {

int gw_create(int64_t capacity, int32_t max_tokens, void** handle_out) {
  if (capacity <= 0 || max_tokens <= 0) return -1;
  Gateway* g = new Gateway();
  g->capacity = capacity;
  g->max_tokens = max_tokens;
  g->slots.resize(capacity);
  g->fifo.resize(capacity);
  g->free_list.reserve(capacity);
  for (int64_t i = capacity - 1; i >= 0; --i) {
    g->slots[i].tokens.resize(max_tokens);
    g->free_list.push_back((int32_t)i);
  }
  *handle_out = g;
  return 0;
}

int64_t gw_submit(void* handle, const int32_t* tokens, int32_t n_tokens,
                  int32_t video_row) {
  Gateway* g = (Gateway*)handle;
  if (n_tokens < 0 || n_tokens > g->max_tokens) return -3;
  std::unique_lock<std::mutex> lk(g->mu);
  if (g->shutdown) return -2;
  if (g->free_list.empty()) return -1;
  int32_t idx = g->free_list.back();
  g->free_list.pop_back();
  Slot& s = g->slots[idx];
  s.state = SlotState::kQueued;
  std::memcpy(s.tokens.data(), tokens, n_tokens * sizeof(int32_t));
  if (n_tokens < g->max_tokens)
    std::memset(s.tokens.data() + n_tokens, 0,
                (g->max_tokens - n_tokens) * sizeof(int32_t));
  s.n_tokens = n_tokens;
  s.video_row = video_row;
  g->fifo[(g->fifo_head + g->fifo_len) % g->capacity] = idx;
  g->fifo_len++;
  g->submitted++;
  int64_t ticket = ticket_of(g, idx);
  lk.unlock();
  g->queued_cv.notify_one();
  return ticket;
}

int32_t gw_next_batch(void* handle, int32_t max_batch, int64_t first_wait_us,
                      int64_t flush_us, int64_t* tickets_out,
                      int32_t* tokens_out, int32_t* vids_out) {
  Gateway* g = (Gateway*)handle;
  if (max_batch <= 0) return 0;
  std::unique_lock<std::mutex> lk(g->mu);
  auto first_deadline = Clock::now() + std::chrono::microseconds(first_wait_us);
  while (g->fifo_len == 0) {
    if (g->shutdown) return -1;
    if (g->queued_cv.wait_until(lk, first_deadline) ==
        std::cv_status::timeout && g->fifo_len == 0)
      return g->shutdown ? -1 : 0;
  }
  auto flush_deadline = Clock::now() + std::chrono::microseconds(flush_us);
  int32_t n = 0;
  for (;;) {
    while (n < max_batch && g->fifo_len > 0) {
      int32_t idx = g->fifo[g->fifo_head];
      g->fifo_head = (g->fifo_head + 1) % g->capacity;
      g->fifo_len--;
      Slot& s = g->slots[idx];
      s.state = SlotState::kInflight;
      tickets_out[n] = ticket_of(g, idx);
      std::memcpy(tokens_out + (size_t)n * g->max_tokens, s.tokens.data(),
                  g->max_tokens * sizeof(int32_t));
      vids_out[n] = s.video_row;
      n++;
    }
    if (n >= max_batch || g->shutdown || flush_us <= 0) break;
    if (g->queued_cv.wait_until(lk, flush_deadline) ==
        std::cv_status::timeout)
      break;
  }
  g->batches++;
  g->batched_requests += n;
  return n;
}

int gw_complete(void* handle, const int64_t* tickets, int32_t n,
                const float* starts, const float* ends,
                const float* scores) {
  Gateway* g = (Gateway*)handle;
  {
    std::lock_guard<std::mutex> lk(g->mu);
    for (int32_t i = 0; i < n; ++i) {
      int32_t idx = slot_of(g, tickets[i]);
      if (idx < 0 || g->slots[idx].state != SlotState::kInflight) continue;
      Slot& s = g->slots[idx];
      s.start = starts[i];
      s.end = ends[i];
      s.score = scores[i];
      s.state = SlotState::kDone;
      g->completed++;
    }
  }
  g->done_cv.notify_all();
  return 0;
}

int gw_wait(void* handle, int64_t ticket, int64_t timeout_us, float* start,
            float* end, float* score) {
  Gateway* g = (Gateway*)handle;
  std::unique_lock<std::mutex> lk(g->mu);
  int32_t idx = slot_of(g, ticket);
  if (idx < 0) return -2;
  auto deadline = Clock::now() + std::chrono::microseconds(timeout_us);
  while (g->slots[idx].state != SlotState::kDone) {
    if (g->slots[idx].gen != (uint64_t)(ticket / g->capacity)) return -2;
    if (g->done_cv.wait_until(lk, deadline) == std::cv_status::timeout &&
        g->slots[idx].state != SlotState::kDone)
      return -1;
  }
  Slot& s = g->slots[idx];
  *start = s.start;
  *end = s.end;
  *score = s.score;
  // Result consumed: recycle the slot under a new generation.
  s.state = SlotState::kFree;
  s.gen++;
  g->free_list.push_back(idx);
  return 0;
}

int gw_stats(void* handle, uint64_t* submitted, uint64_t* completed,
             uint64_t* batches, uint64_t* batched_requests) {
  Gateway* g = (Gateway*)handle;
  std::lock_guard<std::mutex> lk(g->mu);
  *submitted = g->submitted;
  *completed = g->completed;
  *batches = g->batches;
  *batched_requests = g->batched_requests;
  return 0;
}

int gw_shutdown(void* handle) {
  Gateway* g = (Gateway*)handle;
  {
    std::lock_guard<std::mutex> lk(g->mu);
    g->shutdown = true;
  }
  g->queued_cv.notify_all();
  g->done_cv.notify_all();
  return 0;
}

int gw_destroy(void* handle) {
  delete (Gateway*)handle;
  return 0;
}

}  // extern "C"
