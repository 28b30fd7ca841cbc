// Native batch assembler: background-threaded shuffle + gather ring buffer.
//
// The reference feeds the GPU from torchvision DataLoader worker processes
// (pin_memory/persistent_workers/prefetch_factor, HQAViT_CIFAR100.py:
// 1312-1331).  On TPU the dataset is a single resident uint8 array; the
// remaining host work is per-epoch shuffling and gathering [B,H,W,3]
// batches.  This library does that in C++ on a background thread with a
// lock-free-ish ring of preallocated slots, so batch assembly fully
// overlaps device compute and Python never holds the GIL for the gather.
//
// C ABI (used from qavit_tpu/native/loader.py via ctypes):
//   handle = batcher_create(images, labels, n, item_bytes, batch,
//                           seed, drop_last, queue_depth, shuffle)
//   slot   = batcher_next(handle)            // blocks; -1 at epoch end
//   imgs   = batcher_slot_images(handle, slot)
//   lbls   = batcher_slot_labels(handle, slot)
//   batcher_release(handle, slot)
//   batcher_start_epoch(handle)              // reshuffle + refill
//   batcher_destroy(handle)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batcher {
  const uint8_t* images = nullptr;
  const int32_t* labels = nullptr;
  int64_t n = 0;
  int64_t item_bytes = 0;
  int64_t batch = 0;
  bool drop_last = true;
  bool shuffle = true;
  std::mt19937_64 rng;

  int64_t num_batches = 0;
  std::vector<int64_t> order;

  // slots
  int64_t depth = 0;
  std::vector<std::vector<uint8_t>> img_slots;
  std::vector<std::vector<int32_t>> lbl_slots;
  std::vector<int64_t> slot_count;  // actual batch size in slot

  std::mutex mu;
  std::condition_variable cv_free, cv_ready;
  std::queue<int64_t> free_slots, ready_slots;
  int64_t produced = 0;   // batches produced this epoch
  int64_t consumed = 0;
  std::atomic<bool> stop{false};
  std::thread worker;

  void fill_slot(int64_t slot, int64_t batch_idx) {
    int64_t start = batch_idx * batch;
    int64_t count = std::min(batch, n - start);
    uint8_t* dst = img_slots[slot].data();
    int32_t* ldst = lbl_slots[slot].data();
    for (int64_t i = 0; i < count; ++i) {
      int64_t src = order[start + i];
      std::memcpy(dst + i * item_bytes, images + src * item_bytes,
                  item_bytes);
      ldst[i] = labels[src];
    }
    slot_count[slot] = count;
  }

  void run() {
    while (!stop.load()) {
      int64_t batch_idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        if (produced >= num_batches) {
          // epoch done; wait for start_epoch or stop
          cv_free.wait(lk, [&] {
            return stop.load() || produced < num_batches;
          });
          continue;
        }
        batch_idx = produced;
      }
      int64_t slot;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] { return stop.load() || !free_slots.empty(); });
        if (stop.load()) return;
        slot = free_slots.front();
        free_slots.pop();
      }
      fill_slot(slot, batch_idx);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready_slots.push(slot);
        ++produced;
      }
      cv_ready.notify_one();
    }
  }

  void start_epoch() {
    std::lock_guard<std::mutex> lk(mu);
    if (shuffle) {
      std::shuffle(order.begin(), order.end(), rng);
    }
    produced = 0;
    consumed = 0;
    cv_free.notify_all();
  }
};

}  // namespace

extern "C" {

void* batcher_create(const uint8_t* images, const int32_t* labels,
                     int64_t n, int64_t item_bytes, int64_t batch,
                     uint64_t seed, int drop_last, int64_t queue_depth,
                     int shuffle) {
  auto* b = new Batcher();
  b->images = images;
  b->labels = labels;
  b->n = n;
  b->item_bytes = item_bytes;
  b->batch = batch;
  b->drop_last = drop_last != 0;
  b->shuffle = shuffle != 0;
  b->rng.seed(seed);
  b->num_batches = b->drop_last ? n / batch : (n + batch - 1) / batch;
  b->order.resize(n);
  for (int64_t i = 0; i < n; ++i) b->order[i] = i;
  b->depth = queue_depth;
  b->img_slots.resize(queue_depth);
  b->lbl_slots.resize(queue_depth);
  b->slot_count.assign(queue_depth, 0);
  for (int64_t s = 0; s < queue_depth; ++s) {
    b->img_slots[s].resize(batch * item_bytes);
    b->lbl_slots[s].resize(batch);
    b->free_slots.push(s);
  }
  b->start_epoch();
  b->worker = std::thread([b] { b->run(); });
  return b;
}

int64_t batcher_num_batches(void* h) {
  return static_cast<Batcher*>(h)->num_batches;
}

// returns slot index, or -1 when the epoch is exhausted
int64_t batcher_next(void* h) {
  auto* b = static_cast<Batcher*>(h);
  std::unique_lock<std::mutex> lk(b->mu);
  b->cv_ready.wait(lk, [&] {
    return b->stop.load() || !b->ready_slots.empty() ||
           (b->consumed >= b->num_batches);
  });
  if (b->stop.load() || b->ready_slots.empty()) return -1;
  int64_t slot = b->ready_slots.front();
  b->ready_slots.pop();
  ++b->consumed;
  return slot;
}

const uint8_t* batcher_slot_images(void* h, int64_t slot) {
  return static_cast<Batcher*>(h)->img_slots[slot].data();
}

const int32_t* batcher_slot_labels(void* h, int64_t slot) {
  return static_cast<Batcher*>(h)->lbl_slots[slot].data();
}

int64_t batcher_slot_count(void* h, int64_t slot) {
  return static_cast<Batcher*>(h)->slot_count[slot];
}

void batcher_release(void* h, int64_t slot) {
  auto* b = static_cast<Batcher*>(h);
  {
    std::lock_guard<std::mutex> lk(b->mu);
    b->free_slots.push(slot);
  }
  b->cv_free.notify_one();
}

void batcher_start_epoch(void* h) {
  static_cast<Batcher*>(h)->start_epoch();
}

void batcher_destroy(void* h) {
  auto* b = static_cast<Batcher*>(h);
  b->stop.store(true);
  b->cv_free.notify_all();
  b->cv_ready.notify_all();
  if (b->worker.joinable()) b->worker.join();
  delete b;
}

}  // extern "C"
