// castro_io: native asynchronous I/O backend for checkpoints/plotfiles.
//
// Role parallel to the reference's native I/O layer (AMReX VisMF with
// MPI_THREAD_MULTIPLE async output, `Exec/Make.Castro:96-100`,
// `Source/driver/Castro_io.cpp`): the simulation thread hands off
// serialized field blobs and keeps stepping; a worker pool does the disk
// writes, with CRC32 integrity stamps checked on restart.
//
// C ABI (ctypes-friendly):
//   cio_start(nthreads)              start the pool
//   cio_submit(path, data, nbytes)   copy + enqueue a write, returns seq id
//   cio_pending()                    number of queued/in-flight writes
//   cio_wait_all()                   barrier until the queue drains
//   cio_stop()                       drain + join workers
//   cio_crc32(data, nbytes)          the CRC32 used for the stamps
//   cio_last_error()                 0 ok, else errno of the first failure

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

struct Job {
  std::string path;
  std::vector<uint8_t> data;
};

std::deque<Job> g_queue;
std::mutex g_mu;
std::condition_variable g_cv;
std::condition_variable g_cv_done;
std::vector<std::thread> g_workers;
std::atomic<bool> g_stop{false};
std::atomic<long> g_seq{0};
std::atomic<int> g_inflight{0};
std::atomic<int> g_error{0};

uint32_t crc32_table[256];
bool crc_init_done = false;

void crc_init() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k)
      c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc32_table[i] = c;
  }
  crc_init_done = true;
}

uint32_t crc32(const uint8_t* buf, size_t len) {
  if (!crc_init_done) crc_init();
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < len; ++i)
    c = crc32_table[(c ^ buf[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

void worker_main() {
  for (;;) {
    Job job;
    {
      std::unique_lock<std::mutex> lk(g_mu);
      g_cv.wait(lk, [] { return g_stop.load() || !g_queue.empty(); });
      if (g_queue.empty()) {
        if (g_stop.load()) return;
        continue;
      }
      job = std::move(g_queue.front());
      g_queue.pop_front();
      g_inflight.fetch_add(1);
    }
    FILE* f = std::fopen(job.path.c_str(), "wb");
    if (!f) {
      g_error.store(errno ? errno : -1);
    } else {
      // header: magic, length, crc32
      const char magic[8] = {'C', 'I', 'O', '1', 0, 0, 0, 0};
      uint64_t n = job.data.size();
      uint32_t crc = crc32(job.data.data(), n);
      uint32_t pad = 0;
      if (std::fwrite(magic, 1, 8, f) != 8 ||
          std::fwrite(&n, sizeof(n), 1, f) != 1 ||
          std::fwrite(&crc, sizeof(crc), 1, f) != 1 ||
          std::fwrite(&pad, sizeof(pad), 1, f) != 1 ||
          (n && std::fwrite(job.data.data(), 1, n, f) != n)) {
        g_error.store(errno ? errno : -1);
      }
      std::fclose(f);
    }
    g_inflight.fetch_sub(1);
    g_cv_done.notify_all();
  }
}

}  // namespace

extern "C" {

int cio_start(int nthreads) {
  if (!g_workers.empty()) return 0;
  g_stop.store(false);
  if (nthreads < 1) nthreads = 1;
  for (int i = 0; i < nthreads; ++i) g_workers.emplace_back(worker_main);
  return nthreads;
}

long cio_submit(const char* path, const void* data, uint64_t nbytes) {
  Job job;
  job.path = path;
  job.data.assign(static_cast<const uint8_t*>(data),
                  static_cast<const uint8_t*>(data) + nbytes);
  {
    std::lock_guard<std::mutex> lk(g_mu);
    g_queue.push_back(std::move(job));
  }
  g_cv.notify_one();
  return g_seq.fetch_add(1);
}

int cio_pending() {
  std::lock_guard<std::mutex> lk(g_mu);
  return static_cast<int>(g_queue.size()) + g_inflight.load();
}

void cio_wait_all() {
  std::unique_lock<std::mutex> lk(g_mu);
  g_cv_done.wait(lk, [] { return g_queue.empty() && g_inflight.load() == 0; });
}

void cio_stop() {
  {
    std::lock_guard<std::mutex> lk(g_mu);
    g_stop.store(true);
  }
  g_cv.notify_all();
  for (auto& t : g_workers) t.join();
  g_workers.clear();
}

uint32_t cio_crc32(const void* data, uint64_t nbytes) {
  return crc32(static_cast<const uint8_t*>(data), nbytes);
}

int cio_last_error() { return g_error.load(); }

}  // extern "C"
