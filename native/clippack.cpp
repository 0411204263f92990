// Packed clip cache: mmap'd raw-frame store + threaded batch assembly.
//
// The native data runtime replacing the reference's per-item PIL/OpenCV
// decode path (data_loader.py:595-614 re-decodes JPEGs on every epoch in
// Python worker processes). Here a dataset is decoded ONCE into a packed
// binary file of fixed-size uint8 frames; training batches are then
// assembled by a C++ thread pool doing pure memcpy gathers out of the
// mmap'd pack — no decode, no GIL, page-cache friendly.
//
// Pack layout (little-endian):
//   header:  int64 magic=0x54504c43 ("CLPT"), int64 n_frames,
//            int64 frame_h, int64 frame_w, int64 channels
//   frames:  n_frames * (h*w*c) bytes, frame i at offset
//            header_size + i * frame_bytes
//
// C ABI (ctypes):
//   clippack_open(path) -> handle (int64, 0 on failure)
//   clippack_info(handle, int64 out[4])            // n, h, w, c
//   clippack_gather(handle, const int64* frame_ids, int64 n_ids,
//                   uint8_t* out, int n_threads)   // out: n_ids*frame_bytes
//   clippack_close(handle)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr int64_t kMagic = 0x54504c43;
constexpr int64_t kHeaderBytes = 5 * sizeof(int64_t);

struct Pack {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  int64_t n = 0, h = 0, w = 0, c = 0;
  int64_t frame_bytes = 0;
};

std::mutex g_mu;
std::vector<Pack*> g_packs;

// Handle validation: a stale/forged int64 must fail closed, not memcpy
// from a dangling pointer.
Pack* lookup(int64_t handle) {
  Pack* p = reinterpret_cast<Pack*>(handle);
  std::lock_guard<std::mutex> lock(g_mu);
  return std::find(g_packs.begin(), g_packs.end(), p) != g_packs.end()
             ? p
             : nullptr;
}

}  // namespace

extern "C" {

int64_t clippack_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return 0;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < kHeaderBytes) {
    ::close(fd);
    return 0;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) {
    ::close(fd);
    return 0;
  }
  const int64_t* hdr = static_cast<const int64_t*>(mem);
  if (hdr[0] != kMagic) {
    munmap(mem, st.st_size);
    ::close(fd);
    return 0;
  }
  Pack* p = new Pack;
  p->fd = fd;
  p->data = static_cast<const uint8_t*>(mem);
  p->size = st.st_size;
  p->n = hdr[1];
  p->h = hdr[2];
  p->w = hdr[3];
  p->c = hdr[4];
  // Reject corrupt headers: every field positive, per-dimension bounds that
  // keep frame_bytes well under overflow, and an overflow-safe (division,
  // not multiplication) check that the mmap actually covers n frames.
  bool ok = p->n > 0 && p->h > 0 && p->w > 0 && p->c > 0 &&
            p->h <= (1 << 20) && p->w <= (1 << 20) && p->c <= 16;
  if (ok) {
    p->frame_bytes = p->h * p->w * p->c;
    const int64_t payload = static_cast<int64_t>(p->size) - kHeaderBytes;
    ok = p->frame_bytes > 0 && p->n <= payload / p->frame_bytes;
  }
  if (!ok) {
    munmap(mem, st.st_size);
    ::close(fd);
    delete p;
    return 0;
  }
  std::lock_guard<std::mutex> lock(g_mu);
  g_packs.push_back(p);
  return reinterpret_cast<int64_t>(p);
}

void clippack_info(int64_t handle, int64_t* out) {
  const Pack* p = lookup(handle);
  if (p == nullptr) {
    out[0] = out[1] = out[2] = out[3] = 0;
    return;
  }
  out[0] = p->n;
  out[1] = p->h;
  out[2] = p->w;
  out[3] = p->c;
}

int clippack_gather(int64_t handle, const int64_t* ids, int64_t n_ids,
                    uint8_t* out, int n_threads) {
  const Pack* p = lookup(handle);
  if (p == nullptr) return -1;
  for (int64_t i = 0; i < n_ids; ++i) {
    if (ids[i] < 0 || ids[i] >= p->n) return -1;
  }
  if (n_threads < 1) n_threads = 1;
  const int64_t fb = p->frame_bytes;
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(out + i * fb, p->data + kHeaderBytes + ids[i] * fb, fb);
    }
  };
  if (n_threads == 1 || n_ids < 4) {
    work(0, n_ids);
    return 0;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_ids + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n_ids, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
  return 0;
}

void clippack_close(int64_t handle) {
  Pack* p = reinterpret_cast<Pack*>(handle);
  {
    std::lock_guard<std::mutex> lock(g_mu);
    auto it = std::find(g_packs.begin(), g_packs.end(), p);
    if (it == g_packs.end()) return;  // unknown handle / double close: no-op
    g_packs.erase(it);
  }
  munmap(const_cast<uint8_t*>(p->data), p->size);
  ::close(p->fd);
  delete p;
}

}  // extern "C"
