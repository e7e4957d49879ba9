// Threaded file-prefetch ring for training data staging.
//
// TPU-native counterpart of the reference's optional NVIDIA DALI loader
// (packages/{fastdvdnet,DDnet}/dataloaders.py — C++/CUDA video decode,
// disabled in the shipped configs): on TPU the accelerator does augmentation
// and noise synthesis on device, so the host's only job is feeding raw array
// bytes fast enough. This library overlaps disk reads with train steps using
// a worker pool + bounded ring buffer, exposed through a plain C ABI for
// ctypes (no pybind11 in this image).
//
// Build: see native/Makefile (g++ -O2 -shared -fPIC).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Buffer {
  std::vector<uint8_t> data;
  int64_t index = -1;  // request index this buffer fulfills
  bool ok = false;
};

class PrefetchRing {
 public:
  PrefetchRing(std::vector<std::string> paths, int workers, int capacity)
      : paths_(std::move(paths)), capacity_(capacity), next_request_(0),
        next_delivery_(0), stop_(false) {
    for (int i = 0; i < workers; ++i) {
      threads_.emplace_back([this] { WorkerLoop(); });
    }
  }

  ~PrefetchRing() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_workers_.notify_all();
    cv_consumer_.notify_all();
    for (auto& t : threads_) t.join();
  }

  // Blocks until the next file (in order) is ready; returns its size or -1
  // at end of the list / on read failure.
  int64_t Next(uint8_t** out_data) {
    std::unique_lock<std::mutex> lk(mu_);
    if (next_delivery_ >= (int64_t)paths_.size()) return -1;
    cv_consumer_.wait(lk, [this] {
      return stop_ || FindReady(next_delivery_) != ready_.end();
    });
    if (stop_) return -1;
    auto it = FindReady(next_delivery_);
    current_ = std::move(*it);
    ready_.erase(it);
    ++next_delivery_;
    cv_workers_.notify_all();
    if (!current_.ok) return -1;
    *out_data = current_.data.data();
    return (int64_t)current_.data.size();
  }

 private:
  std::deque<Buffer>::iterator FindReady(int64_t idx) {
    for (auto it = ready_.begin(); it != ready_.end(); ++it)
      if (it->index == idx) return it;
    return ready_.end();
  }

  void WorkerLoop() {
    for (;;) {
      int64_t idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_workers_.wait(lk, [this] {
          return stop_ || (next_request_ < (int64_t)paths_.size() &&
                           (int)ready_.size() < capacity_);
        });
        if (stop_) return;
        idx = next_request_++;
      }
      Buffer buf;
      buf.index = idx;
      buf.ok = ReadFile(paths_[idx], &buf.data);
      {
        std::lock_guard<std::mutex> lk(mu_);
        ready_.push_back(std::move(buf));
      }
      cv_consumer_.notify_all();
    }
  }

  static bool ReadFile(const std::string& path, std::vector<uint8_t>* out) {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out->resize(size);
    bool ok = size == 0 || std::fread(out->data(), 1, size, f) == (size_t)size;
    std::fclose(f);
    return ok;
  }

  std::vector<std::string> paths_;
  const int capacity_;
  int64_t next_request_;
  int64_t next_delivery_;
  bool stop_;
  std::deque<Buffer> ready_;
  Buffer current_;  // keeps the last delivered buffer alive for the caller
  std::mutex mu_;
  std::condition_variable cv_workers_;
  std::condition_variable cv_consumer_;
  std::vector<std::thread> threads_;
};

}  // namespace

extern "C" {

void* prefetch_create(const char** paths, int n_paths, int workers,
                      int capacity) {
  std::vector<std::string> ps(paths, paths + n_paths);
  return new PrefetchRing(std::move(ps), workers, capacity);
}

// Returns size of the next file's bytes (valid until the following call),
// or -1 when exhausted/failed.
int64_t prefetch_next(void* ring, uint8_t** out_data) {
  return static_cast<PrefetchRing*>(ring)->Next(out_data);
}

void prefetch_destroy(void* ring) { delete static_cast<PrefetchRing*>(ring); }

}  // extern "C"
