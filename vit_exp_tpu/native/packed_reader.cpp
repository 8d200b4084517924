// Native packed-shard reader for vit_exp_tpu/data/packed.py.
//
// Replaces the Python memmap + numpy-cast ingest path with direct
// positional reads and a fused dtype conversion, both running on a C++
// thread pool with the GIL released (the ctypes FFI drops it for the
// duration of the call).  Rationale (SURVEY.md §7 hard-part #7): feeding
// a TPU pod slice needs the host ingest path to sustain multi-GB/s; the
// Python path serializes page-fault handling and the fp16→fp32 cast on
// the GIL, while this one scales with host cores and issues real
// preadv-sized reads instead of fault-driven 4 KB pages.
//
// Plain C ABI (no Python.h) so the binding layer is ctypes and the
// library builds with nothing but g++ — see native/__init__.py.
//
// dtype codes: 0 = float32, 1 = float16, 2 = int16, 3 = uint8.

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <unistd.h>

namespace {

// Full positional read (pread returns short counts on signals/EOF).
int pread_full(int fd, unsigned char* dst, long long nbytes, long long off) {
  long long done = 0;
  while (done < nbytes) {
    ssize_t r = pread(fd, dst + done, (size_t)(nbytes - done), off + done);
    if (r < 0) {
      if (errno == EINTR) continue;
      return -errno;
    }
    if (r == 0) return -EIO;  // unexpected EOF: index/shard mismatch
    done += r;
  }
  return 0;
}

inline long long dtype_size(int dtype_code) {
  switch (dtype_code) {
    case 0: return 4;
    case 1: return 2;
    case 2: return 2;
    default: return 1;
  }
}

// Per-dtype loops over typed pointers so the compiler auto-vectorizes the
// widen+fma; a generic per-element dtype switch defeats vectorization
// (measured 0.7 GB/s vs vectorized on one core).
template <typename T>
void convert_typed(const T* __restrict__ s, long long lo, long long hi,
                   float* __restrict__ dst, float scale, float shift) {
  for (long long i = lo; i < hi; ++i) {
    dst[i] = (float)s[i] * scale + shift;
  }
}

void convert_range(const unsigned char* src, int dtype_code, long long lo,
                   long long hi, float* dst, float scale, float shift) {
  if (dtype_code == 0 && scale == 1.0f && shift == 0.0f) {
    std::memcpy(dst + lo, src + 4 * lo, (size_t)(hi - lo) * 4);
    return;
  }
  // Records are 64-byte aligned (packed.py ALIGN) and scratch buffers are
  // malloc'd, so the typed-pointer reinterpret is alignment-safe.
  switch (dtype_code) {
    case 0:
      convert_typed(reinterpret_cast<const float*>(src), lo, hi, dst,
                    scale, shift);
      break;
    case 1:
      convert_typed(reinterpret_cast<const _Float16*>(src), lo, hi, dst,
                    scale, shift);
      break;
    case 2:
      convert_typed(reinterpret_cast<const int16_t*>(src), lo, hi, dst,
                    scale, shift);
      break;
    default:
      convert_typed(src, lo, hi, dst, scale, shift);
      break;
  }
}

template <typename Fn>
int run_pool(long long n_items, int threads, Fn&& body) {
  if (threads < 1) threads = 1;
  if ((long long)threads > n_items) threads = (int)(n_items > 0 ? n_items : 1);
  std::atomic<long long> next(0);
  std::atomic<int> status(0);
  auto worker = [&]() {
    for (;;) {
      long long i = next.fetch_add(1);
      if (i >= n_items || status.load() != 0) break;
      int rc = body(i);
      if (rc != 0) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
      }
    }
  };
  if (threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return status.load();
}

}  // namespace

extern "C" {

// Parallel pread of n records into `out` at byte offsets out_offsets.
int vx_read_batch(const int* fds, const long long* offsets,
                  const long long* nbytes, const long long* out_offsets,
                  long long n, unsigned char* out, int threads) {
  return run_pool(n, threads, [&](long long i) {
    return pread_full(fds[i], out + out_offsets[i], nbytes[i], offsets[i]);
  });
}

// Multithreaded dtype conversion: dst = src·scale + shift over n elements.
int vx_convert_f32(const unsigned char* src, int dtype_code, long long n,
                   float* dst, float scale, float shift, int threads) {
  if (threads < 1) threads = 1;
  long long chunk = (n + threads - 1) / threads;
  if (chunk < (1 << 16)) {  // too small to be worth fan-out
    convert_range(src, dtype_code, 0, n, dst, scale, shift);
    return 0;
  }
  long long n_chunks = (n + chunk - 1) / chunk;
  return run_pool(n_chunks, threads, [&](long long c) {
    long long lo = c * chunk;
    long long hi = lo + chunk < n ? lo + chunk : n;
    convert_range(src, dtype_code, lo, hi, dst, scale, shift);
    return 0;
  });
}

// Fused read+convert: each record i is pread from fds[i]/offsets[i]
// (nbytes[i] bytes of dtype_code) and converted to float32 at
// dst + out_elem_offsets[i].  scratch must hold max(nbytes) per thread;
// scratch_stride is that per-thread capacity in bytes.
int vx_read_convert_f32(const int* fds, const long long* offsets,
                        const long long* nbytes, int dtype_code,
                        const long long* out_elem_offsets, long long n,
                        float* dst, float scale, float shift,
                        unsigned char* scratch, long long scratch_stride,
                        int threads) {
  if (threads < 1) threads = 1;
  std::atomic<int> slot_counter(0);
  thread_local int slot = -1;
  // hand each pool thread a scratch slot on first use
  return run_pool(n, threads, [&](long long i) {
    if (slot < 0) slot = slot_counter.fetch_add(1);
    unsigned char* buf = scratch + (long long)slot * scratch_stride;
    if (dtype_code == 0 && scale == 1.0f && shift == 0.0f) {
      // float32 passthrough: read straight into dst, no scratch hop
      return pread_full(fds[i],
                        reinterpret_cast<unsigned char*>(
                            dst + out_elem_offsets[i]),
                        nbytes[i], offsets[i]);
    }
    int rc = pread_full(fds[i], buf, nbytes[i], offsets[i]);
    if (rc != 0) return rc;
    long long n_elem = nbytes[i] / dtype_size(dtype_code);
    convert_range(buf, dtype_code, 0, n_elem, dst + out_elem_offsets[i],
                  scale, shift);
    return 0;
  });
}

}  // extern "C"
