// lm2a_loader: native batch gatherer over packed .npy shards.
//
// The reference feeds training with 8 torch DataLoader worker PROCESSES that
// re-decompress npz shards every epoch (/root/reference/train.py:58,
// datasetcode/dataset.py:109-187). The TPU-native replacement packs each
// split once into flat memory-mapped .npy arrays (lm2a_tpu.data.dataset) and
// this library assembles batches from them off the Python thread:
//
//   - mmap'ed zero-copy source arrays (no per-epoch decompression),
//   - row gathers done by a C++ worker thread (no GIL, overlaps with the
//     jitted train step and the host->device transfer),
//   - a submit/wait FIFO queue (up to kMaxQueue requests in flight) so
//     batch k+1 is being gathered while batch k trains AND the next
//     epoch's first group can be queued across the epoch boundary
//     (validation/checkpoint time becomes gather time).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdlib>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct NpyArray {
  const float* data = nullptr;   // first element (after header)
  void* map_base = nullptr;      // mmap base
  size_t map_len = 0;
  int64_t rows = 0;
  int64_t row_elems = 0;  // product of trailing dims

  bool ok() const { return data != nullptr; }
};

// Minimal .npy v1/v2 header parser for C-order little-endian float32.
bool open_npy(const char* path, NpyArray* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return false;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return false;

  const unsigned char* p = static_cast<const unsigned char*>(base);
  if (st.st_size < 10 || memcmp(p, "\x93NUMPY", 6) != 0) {
    munmap(base, st.st_size);
    return false;
  }
  int major = p[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = p[8] | (p[9] << 8);
    header_off = 10;
  } else {
    header_len = p[8] | (p[9] << 8) | (p[10] << 16) |
                 (static_cast<size_t>(p[11]) << 24);
    header_off = 12;
  }
  std::string header(reinterpret_cast<const char*>(p + header_off), header_len);

  if (header.find("'descr': '<f4'") == std::string::npos ||
      header.find("'fortran_order': False") == std::string::npos) {
    munmap(base, st.st_size);
    return false;
  }
  size_t sp = header.find("'shape': (");
  if (sp == std::string::npos) {
    munmap(base, st.st_size);
    return false;
  }
  sp += 10;
  size_t ep = header.find(')', sp);
  std::string shape_str = header.substr(sp, ep - sp);
  std::vector<int64_t> dims;
  const char* s = shape_str.c_str();
  while (*s) {
    while (*s == ' ' || *s == ',') s++;
    if (!*s) break;
    dims.push_back(strtoll(s, const_cast<char**>(&s), 10));
  }
  if (dims.empty()) {
    munmap(base, st.st_size);
    return false;
  }
  out->map_base = base;
  out->map_len = st.st_size;
  out->data = reinterpret_cast<const float*>(p + header_off + header_len);
  out->rows = dims[0];
  out->row_elems = 1;
  for (size_t i = 1; i < dims.size(); ++i) out->row_elems *= dims[i];
  return true;
}

struct Request {
  std::vector<int64_t> idx;
  float* mel;
  float* motion;
  float* lyrics;
};

struct Loader {
  NpyArray mel, motion, lyrics;

  // async worker state: a FIFO of queued requests plus completion
  // counters. A request is "done" only after its gather has fully landed
  // in the caller's buffers (the round-1 torn-batch race was exactly a
  // completion signal that fired at dequeue time instead).
  static constexpr size_t kMaxQueue = 4;  // queued + in-flight cap
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<Request> queue;
  bool busy = false;  // worker is actively gathering into the buffers
  bool shutdown = false;
  uint64_t submitted = 0;  // requests accepted by submit()
  uint64_t completed = 0;  // requests whose copy has fully landed
  uint64_t consumed = 0;   // completions handed back through wait()

  void gather(const std::vector<int64_t>& idx, float* mel_out,
              float* motion_out, float* lyrics_out) const {
    // Test hook: LM2A_LOADER_TEST_DELAY_US widens the copy window so the
    // wait()-during-gather race (if reintroduced) fails deterministically.
    if (const char* d = getenv("LM2A_LOADER_TEST_DELAY_US")) {
      long us = strtol(d, nullptr, 10);
      if (us > 0) std::this_thread::sleep_for(std::chrono::microseconds(us));
    }
    const NpyArray* arrs[3] = {&mel, &motion, &lyrics};
    float* outs[3] = {mel_out, motion_out, lyrics_out};
    for (int a = 0; a < 3; ++a) {
      const NpyArray& arr = *arrs[a];
      float* dst = outs[a];
      for (size_t i = 0; i < idx.size(); ++i) {
        const float* src = arr.data + idx[i] * arr.row_elems;
        memcpy(dst + i * arr.row_elems, src,
               arr.row_elems * sizeof(float));
      }
    }
  }

  void worker_loop() {
    std::unique_lock<std::mutex> lk(mu);
    while (true) {
      cv.wait(lk, [this] { return !queue.empty() || shutdown; });
      if (shutdown) return;
      Request r = std::move(queue.front());
      queue.pop_front();
      // `busy` stays true (and `completed` unincremented) until the copy
      // below has fully landed in the caller's buffers.
      busy = true;
      lk.unlock();
      gather(r.idx, r.mel, r.motion, r.lyrics);
      lk.lock();
      busy = false;
      ++completed;
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* lm2a_loader_open(const char* mel_path, const char* motion_path,
                       const char* lyrics_path) {
  auto* l = new Loader();
  if (!open_npy(mel_path, &l->mel) || !open_npy(motion_path, &l->motion) ||
      !open_npy(lyrics_path, &l->lyrics)) {
    delete l;
    return nullptr;
  }
  if (l->mel.rows != l->motion.rows || l->mel.rows != l->lyrics.rows) {
    delete l;
    return nullptr;
  }
  l->worker = std::thread([l] { l->worker_loop(); });
  return l;
}

int64_t lm2a_loader_rows(void* handle) {
  return static_cast<Loader*>(handle)->mel.rows;
}

// row_elems for (mel, motion, lyrics), written into dims[0..2]
void lm2a_loader_row_elems(void* handle, int64_t* dims) {
  auto* l = static_cast<Loader*>(handle);
  dims[0] = l->mel.row_elems;
  dims[1] = l->motion.row_elems;
  dims[2] = l->lyrics.row_elems;
}

// synchronous gather
int lm2a_loader_gather(void* handle, const int64_t* idx, int64_t n,
                       float* mel_out, float* motion_out, float* lyrics_out) {
  auto* l = static_cast<Loader*>(handle);
  std::vector<int64_t> v(idx, idx + n);
  for (int64_t i : v)
    if (i < 0 || i >= l->mel.rows) return -1;
  l->gather(v, mel_out, motion_out, lyrics_out);
  return 0;
}

// asynchronous gather: submit queues a fill of the given buffers on the
// worker thread; up to kMaxQueue requests may be outstanding (-2 when full)
int lm2a_loader_submit(void* handle, const int64_t* idx, int64_t n,
                       float* mel_out, float* motion_out, float* lyrics_out) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  if (l->queue.size() + (l->busy ? 1 : 0) >= Loader::kMaxQueue) return -2;
  for (int64_t i = 0; i < n; ++i)
    if (idx[i] < 0 || idx[i] >= l->mel.rows) return -1;
  l->queue.push_back(Request{std::vector<int64_t>(idx, idx + n), mel_out,
                             motion_out, lyrics_out});
  ++l->submitted;
  l->cv.notify_all();
  return 0;
}

// Block until the OLDEST not-yet-waited request has fully completed
// (requests complete in submission order). No-op when nothing is pending.
int lm2a_loader_wait(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  if (l->consumed >= l->submitted) return 0;
  uint64_t target = l->consumed + 1;
  l->cv.wait(lk, [l, target] { return l->completed >= target; });
  ++l->consumed;
  return 0;
}

void lm2a_loader_close(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->shutdown = true;
    l->cv.notify_all();
  }
  if (l->worker.joinable()) l->worker.join();
  for (NpyArray* a : {&l->mel, &l->motion, &l->lyrics})
    if (a->map_base) munmap(a->map_base, a->map_len);
  delete l;
}

}  // extern "C"
