// starcop_io — native host-side raster IO for the TPU input pipeline.
//
// Role: the framework's data-loader hot path (the niche the reference fills
// with np.memmap + GDAL worker processes: SURVEY.md §2.7). Provides threaded
// windowed reads from raw binary rasters (ENVI BIP/BSQ cubes, .npy tile
// payloads) using pread(2) — no GIL, no per-worker processes, page-cache
// friendly — feeding the host->HBM prefetch pipeline.
//
// Layouts:
//   BIP  (H, W, C): pixel-interleaved — a (row, col) window is H' runs of
//                   W'*C contiguous bytes.
//   BSQ  (C, H, W): band-sequential — a window is C*H' runs of W' bytes.
//   R2   (H, W):    single-band raster (npy payload) — H' runs of W' bytes.
//
// API (C, ctypes-friendly): all functions return 0 on success, -errno-style
// negative codes on failure.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/stat.h>
#include <sys/types.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {

// Read one rectangular window from a raw raster file.
//   path: file to read; offset_bytes: payload start (e.g. npy header size)
//   itemsize: bytes per element; layout: 0=R2, 1=BIP, 2=BSQ
//   shape: [H, W] for R2, [H, W, C] for BIP, [C, H, W] for BSQ
//   window: row_off, col_off, win_h, win_w
//   out: caller buffer of win_h*win_w*(C|1)*itemsize bytes
int starcop_read_window(const char* path, int64_t offset_bytes, int32_t itemsize,
                        int32_t layout, const int64_t* shape,
                        int64_t row_off, int64_t col_off, int64_t win_h,
                        int64_t win_w, uint8_t* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -errno;

  int rc = 0;
  if (layout == 0) {  // R2 (H, W)
    const int64_t W = shape[1];
    for (int64_t r = 0; r < win_h && rc == 0; ++r) {
      int64_t off = offset_bytes + ((row_off + r) * W + col_off) * itemsize;
      ssize_t n = pread(fd, out + r * win_w * itemsize, win_w * itemsize, off);
      if (n != win_w * itemsize) rc = -EIO;
    }
  } else if (layout == 1) {  // BIP (H, W, C)
    const int64_t W = shape[1], C = shape[2];
    const int64_t run = win_w * C * itemsize;
    for (int64_t r = 0; r < win_h && rc == 0; ++r) {
      int64_t off = offset_bytes + (((row_off + r) * W + col_off) * C) * itemsize;
      ssize_t n = pread(fd, out + r * run, run, off);
      if (n != run) rc = -EIO;
    }
  } else if (layout == 2) {  // BSQ (C, H, W)
    const int64_t C = shape[0], H = shape[1], W = shape[2];
    const int64_t run = win_w * itemsize;
    for (int64_t c = 0; c < C && rc == 0; ++c) {
      for (int64_t r = 0; r < win_h && rc == 0; ++r) {
        int64_t off = offset_bytes + ((c * H + row_off + r) * W + col_off) * itemsize;
        ssize_t n = pread(fd, out + (c * win_h + r) * run, run, off);
        if (n != run) rc = -EIO;
      }
    }
  } else {
    rc = -EINVAL;
  }
  close(fd);
  return rc;
}

// Batched windowed reads, parallel across windows (thread pool sized by
// n_threads; 0 = hardware concurrency). Each window may target a different
// file. Buffers must be preallocated by the caller; outs[i] receives window i.
int starcop_read_windows_batch(const char** paths, const int64_t* offsets,
                               int32_t itemsize, int32_t layout,
                               const int64_t* shapes,  // n x 3 (R2 uses [H,W,1])
                               const int64_t* windows,  // n x 4
                               uint8_t** outs, int32_t n, int32_t n_threads) {
  if (n <= 0) return 0;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int nt = n_threads > 0 ? n_threads : (hw > 0 ? hw : 4);
  if (nt > n) nt = n;

  std::vector<int> results(n, 0);
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&, t]() {
      for (int i = t; i < n; i += nt) {
        const int64_t* sh = shapes + 3 * i;
        const int64_t* win = windows + 4 * i;
        results[i] = starcop_read_window(paths[i], offsets[i], itemsize, layout,
                                         sh, win[0], win[1], win[2], win[3],
                                         outs[i]);
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int i = 0; i < n; ++i)
    if (results[i] != 0) return results[i];
  return 0;
}

// File size probe (sanity checks from Python without an extra stat round-trip).
int64_t starcop_file_size(const char* path) {
  struct stat st;
  if (stat(path, &st) != 0) return -errno;
  return static_cast<int64_t>(st.st_size);
}

}  // extern "C"
