// Parallel Zarr v2 chunk decoder.
//
// The reference's input path decompresses chunks one at a time inside
// dask/DataLoader workers (Cluster/ZarrDataLoader.py:69). This native
// reader fills a caller-allocated buffer with N decoded chunks using a
// thread pool: each worker mmap-free reads its chunk file and zlib-
// inflates straight into the output slot, so bulk cube loads
// (ZarrCubeDataset.load_all_windows, data/prefetch.py) saturate disk and
// memory bandwidth without Python per-chunk overhead.
//
// ABI (ctypes, see native/__init__.py):
//   int scc_decode_chunks(const char** paths, int n_chunks,
//                         long chunk_bytes, char* out,
//                         int compressor,   // 0 = raw, 1 = zlib/gzip
//                         int n_threads)
// Missing chunk files zero-fill their slot (zarr fill_value semantics).
// Returns the number of failed chunks (0 on success).

#include <atomic>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// Inflate `src` (zlib or gzip framed) into exactly `dst_len` bytes.
bool inflate_buffer(const unsigned char* src, size_t src_len,
                    unsigned char* dst, size_t dst_len) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  // 32 + MAX_WBITS: auto-detect zlib/gzip framing.
  if (inflateInit2(&zs, 32 + MAX_WBITS) != Z_OK) return false;
  zs.next_in = const_cast<unsigned char*>(src);
  zs.avail_in = static_cast<uInt>(src_len);
  zs.next_out = dst;
  zs.avail_out = static_cast<uInt>(dst_len);
  int rc = inflate(&zs, Z_FINISH);
  bool ok = (rc == Z_STREAM_END) && (zs.total_out == dst_len);
  inflateEnd(&zs);
  return ok;
}

bool decode_one(const char* path, long chunk_bytes, char* out,
                int compressor) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {  // missing chunk -> fill_value (zeros)
    std::memset(out, 0, static_cast<size_t>(chunk_bytes));
    return true;
  }
  std::fseek(f, 0, SEEK_END);
  long raw_len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  bool ok = false;
  if (compressor == 0) {
    ok = (raw_len == chunk_bytes) &&
         std::fread(out, 1, static_cast<size_t>(chunk_bytes), f) ==
             static_cast<size_t>(chunk_bytes);
  } else {
    std::vector<unsigned char> raw(static_cast<size_t>(raw_len));
    if (std::fread(raw.data(), 1, raw.size(), f) == raw.size()) {
      ok = inflate_buffer(raw.data(), raw.size(),
                          reinterpret_cast<unsigned char*>(out),
                          static_cast<size_t>(chunk_bytes));
    }
  }
  std::fclose(f);
  return ok;
}

}  // namespace

extern "C" int scc_decode_chunks(const char** paths, int n_chunks,
                                 long chunk_bytes, char* out,
                                 int compressor, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_chunks) return;
      if (!decode_one(paths[i], chunk_bytes,
                      out + static_cast<size_t>(i) * chunk_bytes,
                      compressor)) {
        failures.fetch_add(1);
      }
    }
  };
  if (n_threads == 1 || n_chunks == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    int spawn = std::min(n_threads, n_chunks);
    pool.reserve(static_cast<size_t>(spawn));
    for (int t = 0; t < spawn; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failures.load();
}
