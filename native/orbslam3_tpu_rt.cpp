// Native runtime for the TPU SLAM framework: bounded inter-actor queues and
// host-side Hamming matching.
//
// Role parity with the reference's C++ runtime layer: the reference wires its
// pipeline with std::thread + mutex/condvar-guarded bounded queues
// (src/LocalMapping.cc:284-296 InsertKeyFrame / KeyframesInQueue,
// src/LoopClosing.cc:311-322, src/Tracking.cc:1618-1622 the IMU queue) and
// burns its matching cycles in XOR+popcount Hamming distance
// (include/ORBmatcher.h:43 DescriptorDistance). Here the device (TPU) does
// the batched matching; this library provides the host-side runtime around
// it: the frame/keyframe/IMU hand-off queues between the track/map/loop
// actors, and a popcount matcher for small host-resident descriptor sets
// (BoW database maintenance) where device dispatch overhead dominates.
//
// C API only (consumed via ctypes — no pybind11 in the image).

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Bounded byte-item queue (condvar-based; overwrite-oldest like the fork's
// odometry queue, or reject-when-full like the reference's <=3 queued KFs).
// ---------------------------------------------------------------------------

struct RtQueue {
  std::mutex mu;
  std::condition_variable cv;
  std::deque<std::vector<uint8_t>> items;
  size_t capacity;
  size_t item_size;
  int drop_oldest;
  int closed;
};

RtQueue* rt_queue_create(size_t capacity, size_t item_size, int drop_oldest) {
  RtQueue* q = new RtQueue();
  q->capacity = capacity;
  q->item_size = item_size;
  q->drop_oldest = drop_oldest;
  q->closed = 0;
  return q;
}

void rt_queue_destroy(RtQueue* q) { delete q; }

// returns 1 on success, 0 if full (reject mode) or closed
int rt_queue_push(RtQueue* q, const uint8_t* data) {
  std::unique_lock<std::mutex> lk(q->mu);
  if (q->closed) return 0;
  if (q->items.size() >= q->capacity) {
    if (!q->drop_oldest) return 0;
    q->items.pop_front();
  }
  q->items.emplace_back(data, data + q->item_size);
  q->cv.notify_one();
  return 1;
}

// returns 1 on success, 0 on timeout/closed-and-empty
int rt_queue_pop(RtQueue* q, uint8_t* out, int timeout_ms) {
  std::unique_lock<std::mutex> lk(q->mu);
  auto ready = [q] { return !q->items.empty() || q->closed; };
  if (timeout_ms < 0) {
    q->cv.wait(lk, ready);
  } else if (!q->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms), ready)) {
    return 0;
  }
  if (q->items.empty()) return 0;  // closed
  std::memcpy(out, q->items.front().data(), q->item_size);
  q->items.pop_front();
  return 1;
}

size_t rt_queue_size(RtQueue* q) {
  std::lock_guard<std::mutex> lk(q->mu);
  return q->items.size();
}

void rt_queue_close(RtQueue* q) {
  std::lock_guard<std::mutex> lk(q->mu);
  q->closed = 1;
  q->cv.notify_all();
}

// ---------------------------------------------------------------------------
// Hamming matching over 256-bit (32-byte) ORB descriptors.
// ---------------------------------------------------------------------------

static inline int hamming32(const uint8_t* a, const uint8_t* b) {
  uint64_t wa, wb;
  int d = 0;
  for (int k = 0; k < 4; ++k) {
    std::memcpy(&wa, a + 8 * k, 8);
    std::memcpy(&wb, b + 8 * k, 8);
    d += __builtin_popcountll(wa ^ wb);
  }
  return d;
}

// Best + second-best match of each query against the database.
// queries: (nq, 32) u8, db: (nd, 32) u8. Outputs per query: best index,
// best distance, second distance (for Lowe ratio tests).
void rt_hamming_match(const uint8_t* queries, size_t nq, const uint8_t* db,
                      size_t nd, int32_t* best_idx, int32_t* best_dist,
                      int32_t* second_dist) {
  for (size_t i = 0; i < nq; ++i) {
    const uint8_t* qd = queries + 32 * i;
    int b1 = 257, b2 = 257, bi = -1;
    for (size_t j = 0; j < nd; ++j) {
      int d = hamming32(qd, db + 32 * j);
      if (d < b1) {
        b2 = b1;
        b1 = d;
        bi = (int)j;
      } else if (d < b2) {
        b2 = d;
      }
    }
    best_idx[i] = bi;
    best_dist[i] = b1;
    second_dist[i] = b2;
  }
}

// Full pairwise Hamming distance matrix (nq x nd) — small-set BoW/vocab ops.
void rt_hamming_matrix(const uint8_t* queries, size_t nq, const uint8_t* db,
                       size_t nd, int32_t* out) {
  for (size_t i = 0; i < nq; ++i) {
    const uint8_t* qd = queries + 32 * i;
    for (size_t j = 0; j < nd; ++j) out[i * nd + j] = hamming32(qd, db + 32 * j);
  }
}

}  // extern "C"
