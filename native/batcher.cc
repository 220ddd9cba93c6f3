// Native host-side data path: memory-mapped feature store + padded batch
// assembly.
//
// The reference's dataloading copies each clip row-by-row in Python
// (data.py:143-170 collator). Feeding a TPU at ~1k clips/s makes that Python
// loop the host bottleneck, so the hot path lives here: the .npy feature
// store is mmap'd once (zero-copy, shared across iterators) and each padded
// batch (feats + padding mask + labels + validity) is assembled by
// multithreaded memcpy straight into caller-provided buffers.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Store {
  const float* data = nullptr;   // flat (total_frames, dim), mmap'd
  size_t mapped_bytes = 0;
  void* map_base = nullptr;
  int64_t dim = 0;
  int64_t rows = 0;
  std::vector<int64_t> sizes;
  std::vector<int64_t> offsets;
};

// ctypes releases the GIL, and the prefetch worker calls batch_assemble
// while the main thread may open another store (e.g. the eval split) — the
// registry must be synchronized. Store contents are immutable after
// registration; closing a store while an assemble on it is in flight is a
// caller-contract violation (the Python wrapper owns each handle's
// lifecycle).
std::mutex g_mu;
std::vector<Store*> g_stores;

int64_t register_store(Store* s) {
  std::lock_guard<std::mutex> lock(g_mu);
  g_stores.push_back(s);
  return static_cast<int64_t>(g_stores.size()) - 1;
}

Store* lookup_store(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mu);
  if (handle < 0 || handle >= static_cast<int64_t>(g_stores.size()))
    return nullptr;
  return g_stores[handle];
}

bool offsets_valid(const Store& s) {
  for (size_t i = 0; i < s.sizes.size(); ++i) {
    if (s.sizes[i] < 0 || s.offsets[i] < 0 ||
        (s.rows > 0 && s.offsets[i] + s.sizes[i] > s.rows))
      return false;
  }
  return true;
}

}  // namespace

extern "C" {

// Opens a raw float32 .npy file. header_offset = byte offset of the data
// section (parsed by the Python side from the npy header), rows x dim.
int64_t store_open(const char* npy_path, int64_t header_offset, int64_t rows,
                   int64_t dim, const int64_t* sizes, const int64_t* offsets,
                   int64_t num_clips) {
  int fd = open(npy_path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  // the declared (rows, dim) region must fit inside the mapped file —
  // truncated .npy or stale .lengths must fail at open, not SIGBUS mid-epoch
  if (dim <= 0 || rows < 0 || header_offset < 0 ||
      static_cast<int64_t>(st.st_size) <
          header_offset + rows * dim * static_cast<int64_t>(sizeof(float))) {
    close(fd);
    return -1;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return -1;
  madvise(base, st.st_size, MADV_WILLNEED);

  auto* s = new Store();
  s->map_base = base;
  s->mapped_bytes = st.st_size;
  s->data = reinterpret_cast<const float*>(
      reinterpret_cast<const char*>(base) + header_offset);
  s->dim = dim;
  s->rows = rows;
  s->sizes.assign(sizes, sizes + num_clips);
  s->offsets.assign(offsets, offsets + num_clips);
  if (!offsets_valid(*s)) {
    munmap(base, st.st_size);
    delete s;
    return -1;
  }
  return register_store(s);
}

// Wraps an already-resident float32 array (e.g. the numpy buffer) — no IO.
// The caller guarantees the buffer outlives the store.
int64_t store_wrap(const float* data, int64_t dim, const int64_t* sizes,
                   const int64_t* offsets, int64_t num_clips) {
  auto* s = new Store();
  s->map_base = nullptr;
  s->mapped_bytes = 0;
  s->data = data;
  s->dim = dim;
  s->rows = 0;  // caller-owned buffer: extent unknown here
  s->sizes.assign(sizes, sizes + num_clips);
  s->offsets.assign(offsets, offsets + num_clips);
  if (!offsets_valid(*s)) {
    delete s;
    return -1;
  }
  return register_store(s);
}

void store_close(int64_t handle) {
  Store* s = nullptr;
  {
    std::lock_guard<std::mutex> lock(g_mu);
    if (handle < 0 || handle >= static_cast<int64_t>(g_stores.size())) return;
    s = g_stores[handle];
    g_stores[handle] = nullptr;
  }
  if (s == nullptr) return;
  if (s->map_base != nullptr) munmap(s->map_base, s->mapped_bytes);
  delete s;
}

// Assembles one padded batch.
//   indices: clip ids, -1 for padded rows            (B)
//   labels_in: per-clip labels or nullptr            (num_clips)
// Outputs (caller-allocated):
//   feats:        B * T * dim float32, zero-filled here
//   padding_mask: B * T uint8 (1 = pad)
//   labels_out:   B int32 (-1 where absent)
//   row_valid:    B uint8
int batch_assemble(int64_t handle, const int64_t* indices, int64_t batch,
                   int64_t t_max, const int32_t* labels_in, float* feats,
                   uint8_t* padding_mask, int32_t* labels_out,
                   uint8_t* row_valid, int32_t n_threads) {
  Store* s = lookup_store(handle);
  if (s == nullptr) return -1;
  const int64_t dim = s->dim;

  if (n_threads <= 0) n_threads = 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t row = next.fetch_add(1);
      if (row >= batch) break;
      float* frow = feats + row * t_max * dim;
      uint8_t* mrow = padding_mask + row * t_max;
      const int64_t idx = indices[row];
      if (idx < 0 || idx >= static_cast<int64_t>(s->sizes.size())) {
        std::memset(frow, 0, sizeof(float) * t_max * dim);
        std::memset(mrow, 1, t_max);
        labels_out[row] = -1;
        row_valid[row] = 0;
        continue;
      }
      int64_t n = s->sizes[idx];
      if (n > t_max) n = t_max;
      std::memcpy(frow, s->data + s->offsets[idx] * dim,
                  sizeof(float) * n * dim);
      std::memset(frow + n * dim, 0, sizeof(float) * (t_max - n) * dim);
      std::memset(mrow, 0, n);
      std::memset(mrow + n, 1, t_max - n);
      labels_out[row] = labels_in ? labels_in[idx] : -1;
      row_valid[row] = 1;
    }
  };
  if (n_threads == 1 || batch < 4) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < n_threads; ++i) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return 0;
}

}  // extern "C"
