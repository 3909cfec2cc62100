// links_tpu native data loader.
//
// The TPU pipeline keeps datasets resident in HBM (links_tpu/data/datasets.py)
// because the H36M keypoint sets are small. This library covers the
// larger-than-HBM case (e.g. full multi-camera MPI-INF-3DHP dumps): a packed
// little-endian binary file is mmap'd, and shuffled epoch batches are
// gathered into caller buffers by a thread pool, overlapping host gather
// with device compute.
//
// File format ("LNKS" v1):
//   magic  u32 = 0x4c4e4b53
//   version u32 = 1
//   n_rows u64
//   n_cols u64            (float32 features per row)
//   data   float32[n_rows * n_cols]
//
// C ABI (ctypes-friendly):
//   links_pack(path, data, n_rows, n_cols) -> 0/errno
//   links_open(path) -> handle (0 on failure)
//   links_rows(h) / links_cols(h)
//   links_shuffle(h, seed)                 Fisher-Yates epoch permutation
//   links_gather(h, start, count, out, n_threads)
//   links_close(h)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <random>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x4c4e4b53;  // "LNKS"
constexpr uint32_t kVersion = 1;

struct Header {
  uint32_t magic;
  uint32_t version;
  uint64_t n_rows;
  uint64_t n_cols;
};

struct Handle {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t mapped = 0;
  uint64_t n_rows = 0;
  uint64_t n_cols = 0;
  std::vector<uint64_t> perm;
  std::mutex mu;
};

const float* row_ptr(const Handle* h, uint64_t row) {
  return reinterpret_cast<const float*>(h->base + sizeof(Header)) +
         row * h->n_cols;
}

}  // namespace

extern "C" {

int links_pack(const char* path, const float* data, uint64_t n_rows,
               uint64_t n_cols) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return errno ? errno : -1;
  Header hdr{kMagic, kVersion, n_rows, n_cols};
  if (std::fwrite(&hdr, sizeof(hdr), 1, f) != 1 ||
      std::fwrite(data, sizeof(float), n_rows * n_cols, f) !=
          n_rows * n_cols) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);
  return 0;
}

void* links_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  const Header* hdr = static_cast<const Header*>(base);
  // Overflow-safe size validation: n_rows * n_cols * 4 can wrap uint64 on a
  // corrupt header, so bound by division instead of multiplying.
  const uint64_t avail_floats =
      (static_cast<uint64_t>(st.st_size) - sizeof(Header)) / sizeof(float);
  if (hdr->magic != kMagic || hdr->version != kVersion || hdr->n_cols == 0 ||
      hdr->n_rows > avail_floats / hdr->n_cols) {
    munmap(base, st.st_size);
    ::close(fd);
    return nullptr;
  }
  auto* h = new Handle;
  h->fd = fd;
  h->base = static_cast<const uint8_t*>(base);
  h->mapped = st.st_size;
  h->n_rows = hdr->n_rows;
  h->n_cols = hdr->n_cols;
  h->perm.resize(h->n_rows);
  for (uint64_t i = 0; i < h->n_rows; ++i) h->perm[i] = i;
  return h;
}

uint64_t links_rows(void* handle) { return static_cast<Handle*>(handle)->n_rows; }
uint64_t links_cols(void* handle) { return static_cast<Handle*>(handle)->n_cols; }

void links_shuffle(void* handle, uint64_t seed) {
  auto* h = static_cast<Handle*>(handle);
  std::lock_guard<std::mutex> lock(h->mu);
  // Reset to identity first so the permutation is a pure function of
  // `seed` (a resumed run replays the same epoch order as a straight run,
  // and the numpy fallback's default_rng(seed).permutation matches in
  // being history-free, though not in the draw itself).
  for (uint64_t i = 0; i < h->n_rows; ++i) h->perm[i] = i;
  std::mt19937_64 rng(seed);
  for (uint64_t i = h->n_rows; i > 1; --i) {
    uint64_t j = rng() % i;
    std::swap(h->perm[i - 1], h->perm[j]);
  }
}

// Gather `count` permuted rows starting at permutation offset `start` into
// `out` (count * n_cols floats), split across n_threads.
int links_gather(void* handle, uint64_t start, uint64_t count, float* out,
                 int n_threads) {
  auto* h = static_cast<Handle*>(handle);
  // overflow-safe bounds check (start + count can wrap uint64)
  if (count > h->n_rows || start > h->n_rows - count) return -1;
  // Serialize against links_shuffle: perm reads must not race the locked
  // swap writes (a caller prefetching the next epoch's shuffle while this
  // batch gathers would otherwise see torn permutation state).
  std::lock_guard<std::mutex> lock(h->mu);
  if (n_threads < 1) n_threads = 1;
  const uint64_t cols = h->n_cols;
  auto work = [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; ++i) {
      std::memcpy(out + i * cols, row_ptr(h, h->perm[start + i]),
                  cols * sizeof(float));
    }
  };
  if (n_threads == 1 || count < 1024) {
    work(0, count);
    return 0;
  }
  std::vector<std::thread> threads;
  uint64_t chunk = (count + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    uint64_t lo = t * chunk;
    uint64_t hi = lo + chunk < count ? lo + chunk : count;
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
  return 0;
}

void links_close(void* handle) {
  auto* h = static_cast<Handle*>(handle);
  munmap(const_cast<uint8_t*>(h->base), h->mapped);
  ::close(h->fd);
  delete h;
}

}  // extern "C"
