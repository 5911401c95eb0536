// Native calibration data loader.
//
// Replaces the reference's per-sample Python np.fromfile loop
// (/root/reference/dipoorlet/forward_net.py:459-464) with a C++ thread
// pool that fills whole batch buffers directly (one pread per sample,
// no intermediate Python objects), plus an async double-buffered
// prefetcher so host IO overlaps device compute.
//
// C ABI (ctypes):
//   dl_load_batch(dir, name, indices, n, sample_bytes, out)   -> 0/err
//   dl_prefetch_start / dl_prefetch_next / dl_prefetch_free   -> async API
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

int read_sample(const std::string& dir, const std::string& name, int64_t idx,
                char* dst, int64_t sample_bytes) {
  char path[4096];
  snprintf(path, sizeof(path), "%s/%s/%lld.bin", dir.c_str(), name.c_str(),
           static_cast<long long>(idx));
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  int64_t off = 0;
  while (off < sample_bytes) {
    ssize_t got = pread(fd, dst + off, sample_bytes - off, off);
    if (got <= 0) {
      close(fd);
      return -2;
    }
    off += got;
  }
  close(fd);
  return 0;
}

int load_batch_impl(const char* dir, const char* name, const int64_t* indices,
                    int64_t n, int64_t sample_bytes, char* out, int n_threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n || err.load() != 0) return;
      int rc = read_sample(dir, name, indices[i], out + i * sample_bytes,
                           sample_bytes);
      if (rc != 0) err.store(rc);
    }
  };
  int nt = n_threads > 0 ? n_threads : 8;
  if (nt > n) nt = static_cast<int>(n);
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return err.load();
}

// ----- async prefetcher ----------------------------------------------------
struct Prefetcher {
  std::string dir, name;
  std::vector<int64_t> indices;
  int64_t batch_size, sample_bytes;
  int n_threads;

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_ready, cv_consumed;
  std::vector<char> buffers[2];
  int64_t batch_start[2] = {-1, -1};
  int64_t batch_len[2] = {0, 0};
  bool ready[2] = {false, false};
  int64_t produced = 0;  // next batch index to produce
  int64_t consumed = 0;  // next batch index to hand out
  int error = 0;
  bool stop = false;

  int64_t num_batches() const {
    return (static_cast<int64_t>(indices.size()) + batch_size - 1) / batch_size;
  }

  void run() {
    const int64_t nb = num_batches();
    while (true) {
      int64_t b;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_consumed.wait(lk, [&] {
          return stop || (produced < nb && produced - consumed < 2);
        });
        if (stop || produced >= nb) return;
        b = produced;
      }
      int slot = b % 2;
      int64_t st = b * batch_size;
      int64_t len = std::min<int64_t>(batch_size, indices.size() - st);
      buffers[slot].resize(batch_size * sample_bytes);
      int rc = load_batch_impl(dir.c_str(), name.c_str(), indices.data() + st,
                               len, sample_bytes, buffers[slot].data(),
                               n_threads);
      {
        std::unique_lock<std::mutex> lk(mu);
        if (rc != 0) error = rc;
        batch_start[slot] = st;
        batch_len[slot] = len;
        ready[slot] = true;
        produced++;
        cv_ready.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

int dl_load_batch(const char* dir, const char* name, const int64_t* indices,
                  int64_t n, int64_t sample_bytes, char* out, int n_threads) {
  return load_batch_impl(dir, name, indices, n, sample_bytes, out, n_threads);
}

void* dl_prefetch_start(const char* dir, const char* name,
                        const int64_t* indices, int64_t n_indices,
                        int64_t batch_size, int64_t sample_bytes,
                        int n_threads) {
  auto* p = new Prefetcher();
  p->dir = dir;
  p->name = name;
  p->indices.assign(indices, indices + n_indices);
  p->batch_size = batch_size;
  p->sample_bytes = sample_bytes;
  p->n_threads = n_threads;
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Copies the next batch into `out` (batch_size*sample_bytes). Returns the
// number of valid samples, 0 at end of stream, negative on error.
int64_t dl_prefetch_next(void* handle, char* out) {
  auto* p = static_cast<Prefetcher*>(handle);
  const int64_t nb = p->num_batches();
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->consumed >= nb) return 0;
  int slot = p->consumed % 2;
  p->cv_ready.wait(lk, [&] { return p->ready[slot] || p->error != 0; });
  if (p->error != 0) return p->error;
  int64_t len = p->batch_len[slot];
  memcpy(out, p->buffers[slot].data(), len * p->sample_bytes);
  p->ready[slot] = false;
  p->consumed++;
  p->cv_consumed.notify_all();
  return len;
}

void dl_prefetch_free(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->stop = true;
    p->cv_consumed.notify_all();
  }
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
