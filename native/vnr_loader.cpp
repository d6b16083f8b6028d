// Out-of-core volume block loader — native runtime component.
//
// TPU-native counterpart of the reference's StreamLoader/RandomBuffer
// (core/samplers/neural_sampler.cpp:377-668): keeps N random blocks of a
// terascale raw volume resident in host memory, continuously replaced by
// background reader threads, and serves random training batches with
// host-side trilinear interpolation (the reference interpolates on the host
// too, :1087-1114, ghost cells included). libaio becomes std::thread +
// pread; the reference's 32 KiB stream granularity (:490-493) is preserved
// by making blocks span the full x extent, so every read is a contiguous
// row span.
//
// Block geometry: (dx, BY, BZ) voxels + 1 ghost layer in +y/+z (for
// trilinear support), so a block load is (BY+1)·(BZ+1) contiguous reads of
// dx voxels each. Boundary blocks clamp.
//
// Exposed as a C ABI for Python ctypes (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <random>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Block {
  std::atomic<int> state{0}; // 0 = empty, 1 = loading, 2 = ready, 3 = in-use
  int64_t by0 = 0, bz0 = 0;  // block origin (voxels)
  int ny = 0, nz = 0;        // valid extent incl. ghost
  std::vector<float> data;   // [nz, ny, dx] normalized float
};

struct Loader {
  int fd = -1;        // O_DIRECT when enabled, else buffered
  int fd_plain = -1;  // always-buffered fallback descriptor
  std::atomic<bool> odirect{false}; // degrades to buffered on EINVAL etc.
  int64_t dx = 0, dy = 0, dz = 0;
  int dtype = 0; // 0=u8 1=i8 2=u16 3=i16 4=u32 5=i32 6=f32 7=f64
  bool bigendian = false;
  int64_t offset = 0;
  int by = 32, bz = 32;
  float vmin = 0.f, vmax = 1.f; // normalization range (data units)
  std::vector<Block> blocks;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> loads{0};
};

constexpr int64_t kAlign = 512; // RandomBuffer::ALIGNMENT (neural_sampler.cpp:491)

size_t dtype_size(int t) {
  switch (t) {
  case 0: case 1: return 1;
  case 2: case 3: return 2;
  case 4: case 5: return 4;
  case 6: return 4;
  case 7: return 8;
  }
  return 4;
}

uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

float convert(const uint8_t* p, int t, bool be) {
  if (!be) {
    switch (t) {
    case 0: return (float)*p;
    case 1: return (float)*(const int8_t*)p;
    case 2: return (float)*(const uint16_t*)p;
    case 3: return (float)*(const int16_t*)p;
    case 4: return (float)*(const uint32_t*)p;
    case 5: return (float)*(const int32_t*)p;
    case 6: return *(const float*)p;
    case 7: return (float)*(const double*)p;
    }
    return 0.f;
  }
  // big-endian file on a little-endian host (VolumeDesc.bigendian)
  switch (t) {
  case 0: return (float)*p;
  case 1: return (float)*(const int8_t*)p;
  case 2: return (float)bswap16(*(const uint16_t*)p);
  case 3: return (float)(int16_t)bswap16(*(const uint16_t*)p);
  case 4: return (float)bswap32(*(const uint32_t*)p);
  case 5: return (float)(int32_t)bswap32(*(const uint32_t*)p);
  case 6: {
    uint32_t v = bswap32(*(const uint32_t*)p);
    float f;
    std::memcpy(&f, &v, 4);
    return f;
  }
  case 7: {
    uint64_t v = bswap64(*(const uint64_t*)p);
    double d;
    std::memcpy(&d, &v, 8);
    return (float)d;
  }
  }
  return 0.f;
}

// load one block: (BY+1)x(BZ+1) contiguous row reads + dtype conversion +
// [vmin,vmax] -> [0,1] normalization (neural_sampler.cpp:244-288 semantics)
bool load_block(Loader* L, Block& b, int64_t by0, int64_t bz0) {
  const int ny = (int)std::min<int64_t>(L->by + 1, L->dy - by0);
  const int nz = (int)std::min<int64_t>(L->bz + 1, L->dz - bz0);
  const size_t es = dtype_size(L->dtype);
  const size_t row_bytes = (size_t)L->dx * es;
  b.by0 = by0;
  b.bz0 = bz0;
  b.ny = ny;
  b.nz = nz;
  b.data.resize((size_t)nz * ny * L->dx);
  // O_DIRECT requires 512-aligned offset/length/buffer: stage each row read
  // through an aligned window covering [off, off+row_bytes)
  const size_t win_bytes = (size_t)(((row_bytes + 2 * kAlign - 1) / kAlign + 1) * kAlign);
  uint8_t* raw = nullptr;
  if (posix_memalign((void**)&raw, kAlign, win_bytes) != 0) return false;
  const float scale =
      (L->vmax > L->vmin) ? 1.f / (L->vmax - L->vmin) : 0.f;
  bool ok = true;
  for (int z = 0; z < nz && ok; ++z) {
    for (int y = 0; y < ny && ok; ++y) {
      const int64_t gy = by0 + y, gz = bz0 + z;
      const int64_t voxel = (gz * L->dy + gy) * L->dx;
      const int64_t off = L->offset + voxel * (int64_t)es;
      const uint8_t* src;
      if (L->odirect.load(std::memory_order_relaxed)) {
        const int64_t aoff = off & ~(kAlign - 1);
        const int64_t need = off - aoff + (int64_t)row_bytes;
        const int64_t alen = ((need + kAlign - 1) / kAlign) * kAlign;
        ssize_t got = pread(L->fd, raw, (size_t)alen, aoff);
        // a short read at EOF is fine as long as the row is covered
        ok = got >= need;
        src = raw + (off - aoff);
        if (!ok) {
          // some devices/filesystems need 4096-byte O_DIRECT alignment:
          // degrade to the buffered descriptor instead of spinning forever
          L->odirect.store(false, std::memory_order_relaxed);
          ssize_t got2 = pread(L->fd_plain, raw, row_bytes, off);
          ok = got2 == (ssize_t)row_bytes;
          src = raw;
        }
      } else {
        ssize_t got = pread(L->fd_plain, raw, row_bytes, off);
        ok = got == (ssize_t)row_bytes;
        src = raw;
      }
      if (!ok) break;
      float* dst = b.data.data() + ((size_t)z * ny + y) * L->dx;
      for (int64_t x = 0; x < L->dx; ++x) {
        // clamp to [0,1] like the reference's convert_volume
        // (neural_sampler.cpp:188-209): a scene-provided range narrower
        // than the data must saturate, not extrapolate
        float v = (convert(src + x * es, L->dtype, L->bigendian) - L->vmin)
                  * scale;
        dst[x] = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
      }
    }
  }
  free(raw);
  return ok;
}

void worker_main(Loader* L, uint64_t seed) {
  std::mt19937_64 rng(seed);
  const int64_t nby = (L->dy + L->by - 1) / L->by;
  const int64_t nbz = (L->dz + L->bz - 1) / L->bz;
  const bool full_coverage = nby * nbz <= (int64_t)L->blocks.size();
  while (!L->stop.load(std::memory_order_relaxed)) {
    // pick a random slot. Empty slots always load; READY slots are only
    // recycled while a majority stays ready — otherwise N threads churn
    // every block through the 'loading' state and sample() never finds a
    // stable resident set (and a small file is re-read thousands of
    // times per second for nothing). When the resident set covers EVERY
    // distinct block (small volumes), recycling is pure churn — with one
    // block it even kept the loader permanently 'loading' (r5 bug:
    // thousands of loads, ready_blocks stuck at 0) — so ready slots are
    // left alone entirely.
    size_t slot = rng() % L->blocks.size();
    Block& b = L->blocks[slot];
    int expect0 = 0;
    if (!b.state.compare_exchange_strong(expect0, 1)) {
      int n_ready = 0;
      for (auto& x : L->blocks)
        if (x.state.load(std::memory_order_relaxed) == 2) ++n_ready;
      int expect2 = 2;
      if (full_coverage || !(n_ready > (int)L->blocks.size() / 2 &&
            b.state.compare_exchange_strong(expect2, 1))) {
        std::this_thread::sleep_for(std::chrono::milliseconds(1));
        continue;
      }
    }
    const int64_t by0 = (int64_t)(rng() % nby) * L->by;
    const int64_t bz0 = (int64_t)(rng() % nbz) * L->bz;
    if (load_block(L, b, by0, bz0)) {
      b.state.store(2, std::memory_order_release);
      L->loads.fetch_add(1, std::memory_order_relaxed);
    } else {
      b.state.store(0, std::memory_order_release);
    }
  }
}

} // namespace

extern "C" {

// bumped whenever the C ABI changes; the Python side rebuilds on mismatch
int vnr_loader_abi_version() { return 4; }

// Streaming value-range scan: one threaded pass over the file computing the
// global (min, max) in data units — the reference computes this in-core
// with TBB at load (neural_sampler.cpp:213-264); out-of-core files don't
// fit, so this reads sequential chunks per thread and never holds more
// than n_threads × 4 MiB. Returns 1 and writes out_minmax[2] on success.
int vnr_scan_minmax(const char* filename, int64_t dx, int64_t dy, int64_t dz,
                    int dtype, int bigendian, int64_t offset, int n_threads,
                    float* out_minmax) {
  const int64_t count = dx * dy * dz;
  if (count <= 0) return 0;
  int fd = open(filename, O_RDONLY);
  if (fd < 0) return 0;
  const size_t es = dtype_size(dtype);
  n_threads = n_threads > 0 ? n_threads : 1;
  if ((int64_t)n_threads > (count + (1 << 20) - 1) / (1 << 20))
    n_threads = (int)((count + (1 << 20) - 1) / (1 << 20));
  std::vector<float> lo(n_threads), hi(n_threads);
  std::vector<int> ok(n_threads, 1);
  auto work = [&](int tid) {
    const int64_t begin = count * tid / n_threads;
    const int64_t end = count * (tid + 1) / n_threads;
    constexpr int64_t kChunk = (int64_t)4 << 20; // bytes per read
    std::vector<uint8_t> buf;
    float mn = 0.f, mx = 0.f;
    bool first = true;
    int64_t at = begin;
    while (at < end) {
      const int64_t n = std::min<int64_t>(end - at, kChunk / (int64_t)es);
      buf.resize((size_t)n * es);
      int64_t got = 0; // pread may return short counts mid-file
      while (got < (int64_t)(n * es)) {
        ssize_t r = pread(fd, buf.data() + got, (size_t)(n * es - got),
                          offset + at * (int64_t)es + got);
        if (r <= 0) { ok[tid] = 0; return; }
        got += r;
      }
      for (int64_t i = 0; i < n; ++i) {
        const float v = convert(buf.data() + i * es, dtype, bigendian != 0);
        if (first) { mn = mx = v; first = false; }
        else if (v < mn) mn = v;
        else if (v > mx) mx = v;
      }
      at += n;
    }
    lo[tid] = mn;
    hi[tid] = mx;
  };
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; ++t) ts.emplace_back(work, t);
  for (auto& t : ts) t.join();
  close(fd);
  for (int t = 0; t < n_threads; ++t)
    if (!ok[t]) return 0;
  float mn = lo[0], mx = hi[0];
  for (int t = 1; t < n_threads; ++t) {
    if (lo[t] < mn) mn = lo[t];
    if (hi[t] > mx) mx = hi[t];
  }
  out_minmax[0] = mn;
  out_minmax[1] = mx;
  return 1;
}

void* vnr_loader_create(const char* filename, int64_t dx, int64_t dy,
                        int64_t dz, int dtype, int bigendian,
                        int64_t offset, float vmin, float vmax, int block_y,
                        int block_z, int n_resident, int n_threads,
                        int use_odirect, uint64_t seed) {
  if (dx <= 0 || dy <= 0 || dz <= 0 || block_y <= 0 || block_z <= 0)
    return nullptr;
  n_resident = n_resident > 0 ? n_resident : 1;
  n_threads = n_threads > 0 ? n_threads : 1;
  auto* L = new Loader();
  L->fd_plain = open(filename, O_RDONLY);
  if (L->fd_plain < 0) {
    delete L;
    return nullptr;
  }
  L->fd = L->fd_plain;
  if (use_odirect) {
    // O_DIRECT bypasses the page cache (the reference's libaio path reads
    // unbuffered too); not all filesystems support it — fall back silently
    int fd = open(filename, O_RDONLY | O_DIRECT);
    if (fd >= 0) {
      L->fd = fd;
      L->odirect.store(true);
    }
  }
  L->dx = dx; L->dy = dy; L->dz = dz;
  L->dtype = dtype;
  L->bigendian = bigendian != 0;
  L->offset = offset;
  L->vmin = vmin; L->vmax = vmax;
  L->by = block_y; L->bz = block_z;
  L->blocks = std::vector<Block>(n_resident);
  // per-host seed from the caller (multi-host streams must decorrelate,
  // outofcore.py module docstring) + per-thread offset
  for (int i = 0; i < n_threads; ++i)
    L->workers.emplace_back(worker_main, L, seed * 0x9E3779B97F4A7C15ULL + i);
  return L;
}

// number of block loads completed so far (progress / warm-up gauge)
int64_t vnr_loader_loads(void* h) {
  return ((Loader*)h)->loads.load(std::memory_order_relaxed);
}

int vnr_loader_ready_blocks(void* h) {
  auto* L = (Loader*)h;
  int n = 0;
  for (auto& b : L->blocks)
    if (b.state.load(std::memory_order_acquire) == 2) ++n;
  return n;
}

// Sample `count` random (coords, values) pairs from resident blocks:
// uniform over ready blocks, uniform-jittered within each block's trilinear
// support, interpolated on the host with ghost rows
// (OutOfCoreSampler::sample, neural_sampler.cpp:1066-1120).
// coords_out: [count,3] normalized [0,1]^3 (x,y,z); values_out: [count].
int vnr_loader_sample(void* h, int64_t count, uint64_t seed,
                      float* coords_out, float* values_out) {
  auto* L = (Loader*)h;
  std::vector<int> ready;
  for (size_t i = 0; i < L->blocks.size(); ++i) {
    int expect = 2;
    if (L->blocks[i].state.compare_exchange_strong(expect, 3))
      ready.push_back((int)i);
  }
  if (ready.empty()) return 0;

  const int nthreads =
      (int)std::min<int64_t>(std::max(1u, std::thread::hardware_concurrency()),
                             std::max<int64_t>(count / 4096, 1));
  std::vector<std::thread> ts;
  auto work = [&](int tid) {
    std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ULL + tid);
    std::uniform_real_distribution<float> uni(0.f, 1.f);
    const int64_t lo = count * tid / nthreads;
    const int64_t hi = count * (tid + 1) / nthreads;
    for (int64_t i = lo; i < hi; ++i) {
      const Block& b = L->blocks[ready[rng() % ready.size()]];
      // continuous position within the block's trilinear support
      const float fx = uni(rng) * (float)L->dx;
      const float fy = uni(rng) * (float)(b.ny - 1);
      const float fz = uni(rng) * (float)(b.nz - 1);
      // trilinear interpolation (voxel centers at integer+0.5)
      const float cx = std::min(std::max(fx - 0.5f, 0.f), (float)(L->dx - 1));
      const int x0 = (int)cx;
      const int x1 = std::min<int>(x0 + 1, (int)L->dx - 1);
      const float wx = cx - (float)x0;
      const int y0 = std::min((int)fy, b.ny - 2 >= 0 ? b.ny - 2 : 0);
      const float wy = fy - (float)y0;
      const int z0 = std::min((int)fz, b.nz - 2 >= 0 ? b.nz - 2 : 0);
      const float wz = fz - (float)z0;
      const int y1 = std::min(y0 + 1, b.ny - 1);
      const int z1 = std::min(z0 + 1, b.nz - 1);
      auto at = [&](int z, int y, int x) {
        return b.data[((size_t)z * b.ny + y) * L->dx + x];
      };
      const float c00 = at(z0, y0, x0) * (1 - wx) + at(z0, y0, x1) * wx;
      const float c10 = at(z0, y1, x0) * (1 - wx) + at(z0, y1, x1) * wx;
      const float c01 = at(z1, y0, x0) * (1 - wx) + at(z1, y0, x1) * wx;
      const float c11 = at(z1, y1, x0) * (1 - wx) + at(z1, y1, x1) * wx;
      const float c0 = c00 * (1 - wy) + c10 * wy;
      const float c1 = c01 * (1 - wy) + c11 * wy;
      values_out[i] = c0 * (1 - wz) + c1 * wz;
      // global normalized coordinates (direct-tex convention: value =
      // tex3D(p) at p = (voxel+0.5)/dims)
      coords_out[i * 3 + 0] = (cx + 0.5f) / (float)L->dx;
      coords_out[i * 3 + 1] =
          ((float)b.by0 + fy /*continuous y within support*/ + 0.5f) /
          (float)L->dy;
      coords_out[i * 3 + 2] = ((float)b.bz0 + fz + 0.5f) / (float)L->dz;
    }
  };
  for (int t = 0; t < nthreads; ++t) ts.emplace_back(work, t);
  for (auto& t : ts) t.join();

  for (int i : ready)
    L->blocks[i].state.store(2, std::memory_order_release);
  return (int)count;
}

void vnr_loader_destroy(void* h) {
  auto* L = (Loader*)h;
  L->stop.store(true);
  for (auto& t : L->workers) t.join();
  if (L->fd != L->fd_plain) close(L->fd);
  close(L->fd_plain);
  delete L;
}

} // extern "C"
