// Async file loader — native runtime component for the MACARONS data path.
//
// The reference framework leans on PyTorch's native DataLoader workers for its
// disk-heavy replay pipeline (every captured frame is written to disk and
// re-read for depth replay/supervision, SURVEY.md §3.1). This is the TPU-side
// equivalent: a C++ thread-pool that prefetches whole files into memory while
// the device computes, exposed through a minimal C API consumed via ctypes
// (macarons_tpu/utils/native_loader.py). No Python GIL is held during IO.
//
// Build: g++ -O2 -shared -fPIC -pthread -o libasync_loader.so async_loader.cpp

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Job {
  std::string path;
  std::vector<uint8_t> data;
  std::atomic<int> state{0};  // 0 = pending, 1 = done, -1 = error
};

struct Loader {
  std::vector<std::thread> workers;
  std::deque<int64_t> queue;
  std::unordered_map<int64_t, Job*> jobs;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int64_t> next_id{1};
  bool stopping = false;

  explicit Loader(int n_threads) {
    for (int i = 0; i < n_threads; ++i) {
      workers.emplace_back([this] { this->run(); });
    }
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lock(mu);
      stopping = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
    for (auto& kv : jobs) delete kv.second;
  }

  void run() {
    for (;;) {
      int64_t id;
      Job* job;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv.wait(lock, [this] { return stopping || !queue.empty(); });
        if (stopping && queue.empty()) return;
        id = queue.front();
        queue.pop_front();
        job = jobs.at(id);
      }
      FILE* f = std::fopen(job->path.c_str(), "rb");
      if (!f) {
        job->state.store(-1);
        continue;
      }
      std::fseek(f, 0, SEEK_END);
      long size = std::ftell(f);
      std::fseek(f, 0, SEEK_SET);
      job->data.resize(static_cast<size_t>(size));
      size_t got = std::fread(job->data.data(), 1, job->data.size(), f);
      std::fclose(f);
      job->state.store(got == job->data.size() ? 1 : -1);
    }
  }

  int64_t submit(const char* path) {
    int64_t id = next_id.fetch_add(1);
    Job* job = new Job();
    job->path = path;
    {
      std::lock_guard<std::mutex> lock(mu);
      jobs[id] = job;
      queue.push_back(id);
    }
    cv.notify_one();
    return id;
  }

  Job* find(int64_t id) {
    std::lock_guard<std::mutex> lock(mu);
    auto it = jobs.find(id);
    return it == jobs.end() ? nullptr : it->second;
  }

  void erase(int64_t id) {
    std::lock_guard<std::mutex> lock(mu);
    auto it = jobs.find(id);
    if (it != jobs.end()) {
      delete it->second;
      jobs.erase(it);
    }
  }
};

}  // namespace

extern "C" {

void* al_create(int n_threads) { return new Loader(n_threads); }

void al_destroy(void* l) { delete static_cast<Loader*>(l); }

int64_t al_submit(void* l, const char* path) {
  return static_cast<Loader*>(l)->submit(path);
}

// 0 = pending, 1 = done, -1 = error / unknown job
int al_poll(void* l, int64_t id) {
  Job* job = static_cast<Loader*>(l)->find(id);
  if (!job) return -1;
  return job->state.load();
}

int64_t al_size(void* l, int64_t id) {
  Job* job = static_cast<Loader*>(l)->find(id);
  if (!job || job->state.load() != 1) return -1;
  return static_cast<int64_t>(job->data.size());
}

// Copies the loaded bytes into dst and releases the job. Returns bytes copied
// or -1. Busy-waits briefly if the job is still in flight (caller should poll).
int64_t al_take(void* l, int64_t id, void* dst, int64_t dst_size) {
  Loader* loader = static_cast<Loader*>(l);
  Job* job = loader->find(id);
  if (!job) return -1;
  while (job->state.load() == 0) {
    std::this_thread::yield();
  }
  if (job->state.load() != 1) {
    loader->erase(id);
    return -1;
  }
  int64_t n = static_cast<int64_t>(job->data.size());
  if (n > dst_size) {
    loader->erase(id);
    return -1;
  }
  std::memcpy(dst, job->data.data(), static_cast<size_t>(n));
  loader->erase(id);
  return n;
}

}  // extern "C"
