// bmt_io: native feature-loading runtime for bmt_tpu.
//
// Replaces the Python hot path of the input pipeline (npy load + segment
// crop + padding + batch assembly; reference semantics:
// datasets/load_features.py:14-95) with mmap'd zero-copy reads and a
// persistent thread pool, exposed through a C ABI consumed via ctypes
// (bmt_tpu/data/native.py). The output is written directly into a
// caller-provided contiguous (B, L, D) float32 buffer that feeds
// jax.device_put.
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// npy parsing (v1.0/v2.0 headers, little-endian f4/f8, C-order, 1-2 dims)
// ---------------------------------------------------------------------------

struct NpyView {
  const float* data = nullptr;   // only valid when dtype is f4
  const void* raw = nullptr;
  void* map_base = nullptr;
  size_t map_len = 0;
  int64_t rows = 0;
  int64_t cols = 0;
  int dtype_size = 0;            // 4 (f4) or 8 (f8)
  bool ok = false;
};

bool parse_header(const char* hdr, size_t hdr_len, int64_t* rows,
                  int64_t* cols, int* dtype_size) {
  std::string h(hdr, hdr_len);
  // descr
  size_t dp = h.find("'descr'");
  if (dp == std::string::npos) return false;
  size_t q1 = h.find('\'', dp + 7);
  size_t q2 = h.find('\'', q1 + 1);
  std::string descr = h.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4" || descr == "|f4" || descr == "=f4") *dtype_size = 4;
  else if (descr == "<f8" || descr == "=f8") *dtype_size = 8;
  else return false;
  // fortran_order must be False
  if (h.find("'fortran_order': True") != std::string::npos) return false;
  // shape tuple
  size_t sp = h.find("'shape'");
  if (sp == std::string::npos) return false;
  size_t p1 = h.find('(', sp);
  size_t p2 = h.find(')', p1);
  std::string shape = h.substr(p1 + 1, p2 - p1 - 1);
  // accept only 1-D "(n,)" or 2-D "(n, m)" shapes; a 3-D tuple must be
  // rejected (sscanf would silently truncate it to its first two dims)
  int commas = 0;
  for (char ch : shape)
    if (ch == ',') ++commas;
  bool trailing_comma = !shape.empty() &&
      shape.find_last_not_of(' ') != std::string::npos &&
      shape[shape.find_last_not_of(' ')] == ',';
  int ndims = commas + (trailing_comma ? 0 : 1);
  if (ndims > 2) return false;
  long long r = 0, c = 1;
  int n = sscanf(shape.c_str(), "%lld , %lld", &r, &c);
  if (n < 1) return false;
  if (n == 1) c = 1;
  if (r < 0 || c <= 0) return false;
  *rows = r;
  *cols = c;
  return true;
}

NpyView open_npy(const char* path) {
  NpyView v;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return v;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 12) { close(fd); return v; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return v;
  const unsigned char* p = static_cast<const unsigned char*>(base);
  if (memcmp(p, "\x93NUMPY", 6) != 0) { munmap(base, st.st_size); return v; }
  int major = p[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = p[8] | (p[9] << 8);
    hoff = 10;
  } else {
    hlen = p[8] | (p[9] << 8) | (p[10] << 16) |
           (static_cast<size_t>(p[11]) << 24);
    hoff = 12;
  }
  // header and data must lie within the mapped file, or a truncated /
  // corrupt .npy would read past the mapping (SIGBUS) instead of taking
  // the clean missing-file zero-fill path
  if (hoff + hlen > static_cast<size_t>(st.st_size)) {
    munmap(base, st.st_size);
    return v;
  }
  int64_t rows, cols;
  int dsize;
  if (!parse_header(reinterpret_cast<const char*>(p + hoff), hlen, &rows,
                    &cols, &dsize)) {
    munmap(base, st.st_size);
    return v;
  }
  // rows*cols*dsize must be computed overflow-free: a corrupt header
  // declaring a huge shape would wrap the product mod 2^64, pass the
  // bounds check, and re-open the SIGBUS hole this check closes
  if (rows < 0 || cols <= 0 || dsize <= 0 ||
      static_cast<uint64_t>(rows) >
          UINT64_MAX / static_cast<uint64_t>(cols) /
              static_cast<uint64_t>(dsize)) {
    munmap(base, st.st_size);
    return v;
  }
  uint64_t data_bytes =
      static_cast<uint64_t>(rows) * cols * dsize;
  if (data_bytes > static_cast<uint64_t>(st.st_size) - hoff - hlen) {
    munmap(base, st.st_size);
    return v;
  }
  v.raw = p + hoff + hlen;
  v.data = dsize == 4 ? reinterpret_cast<const float*>(v.raw) : nullptr;
  v.map_base = base;
  v.map_len = st.st_size;
  v.rows = rows;
  v.cols = cols;
  v.dtype_size = dsize;
  v.ok = true;
  return v;
}

void close_npy(NpyView& v) {
  if (v.map_base) munmap(v.map_base, v.map_len);
  v = NpyView();
}

// copy [r0, r1) rows into dst as f4, converting from f8 if needed
void copy_rows(const NpyView& v, int64_t r0, int64_t r1, float* dst) {
  int64_t n = (r1 - r0) * v.cols;
  if (v.dtype_size == 4) {
    memcpy(dst, v.data + r0 * v.cols, n * sizeof(float));
  } else {
    const double* src =
        reinterpret_cast<const double*>(v.raw) + r0 * v.cols;
    for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(src[i]);
  }
}

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void run(std::vector<std::function<void()>> jobs) {
    // The completion count is mutated and checked UNDER done_mu: with an
    // atomic counter incremented outside the lock, the waiter could observe
    // completion and return (destroying done_mu/done_cv/jobs) while the
    // last worker was still about to lock the mutex — use-after-scope.
    size_t done = 0;
    size_t total = jobs.size();
    std::mutex done_mu;
    std::condition_variable done_cv;
    {
      std::unique_lock<std::mutex> lk(mu_);
      for (size_t j = 0; j < total; ++j) {
        queue_.push([&, j] {
          jobs[j]();
          std::unique_lock<std::mutex> dlk(done_mu);
          if (++done == total) done_cv.notify_one();
        });
      }
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> dlk(done_mu);
    done_cv.wait(dlk, [&] { return done == total; });
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        job = std::move(queue_.front());
        queue_.pop();
      }
      job();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* pool() {
  static ThreadPool p(std::max(2u, std::thread::hardware_concurrency()));
  return &p;
}

// reference crop semantics (datasets/load_features.py:14-34): proportional
// indices with a 1-frame fallback for degenerate segments, then PYTHON
// slice semantics (the reference crops with feature[s:e], so negative
// indices wrap from the end). Returns false for inputs the Python side
// cannot compute (duration == 0 raises ZeroDivisionError there; NaN/inf
// indices have no defined int conversion) -> caller zero-fills, exactly
// like the numpy fallback's except path.
bool crop_range(int64_t rows, double start, double end, double duration,
                int64_t* r0, int64_t* r1) {
  if (!(std::isfinite(start) && std::isfinite(end) &&
        std::isfinite(duration)) ||
      duration == 0.0) {
    return false;
  }
  double fs = static_cast<double>(rows) * (start / duration);
  double fe = static_cast<double>(rows) * (end / duration);
  // int64 cast of out-of-range doubles is UB; such indices only arise
  // from corrupt metadata, which the fallback also zero-fills
  if (!(std::isfinite(fs) && std::isfinite(fe)) || fs >= 9.2e18 ||
      fs <= -9.2e18 || fe >= 9.2e18 || fe <= -9.2e18) {
    return false;
  }
  int64_t s = static_cast<int64_t>(fs);
  int64_t e = static_cast<int64_t>(fe);
  if (s == e) {
    if (s == rows) s -= 1;
    else e += 1;
  }
  if (s < 0) s += rows;
  if (s < 0) s = 0;
  if (s > rows) s = rows;
  if (e < 0) e += rows;
  if (e < 0) e = 0;
  if (e > rows) e = rows;
  *r0 = s;
  *r1 = e;
  return true;
}

}  // namespace

extern "C" {

// Inspect an npy: returns 0 and fills shape[2] on success, -1 otherwise.
int bmt_npy_shape(const char* path, int64_t* shape) {
  NpyView v = open_npy(path);
  if (!v.ok) return -1;
  shape[0] = v.rows;
  shape[1] = v.cols;
  close_npy(v);
  return 0;
}

// Batch crop-or-full + pad into out (B, out_len, D) float32 (caller owns).
//
// For item b:
//   paths[b]        npy file (S_b, D); D must equal `cols`
//   if full[b] != 0 -> take all rows (up to out_len), else crop
//                      [starts[b], ends[b]] / durations[b] proportionally
//   pad remaining rows with pad_value
//   missing/invalid file -> one zero row + padding (reference
//   fill_missing_features('zero') semantics), status[b] = 1
// Returns 0 on success (statuses carry per-item info).
int bmt_batch_load(const char** paths, int64_t n, const double* starts,
                   const double* ends, const double* durations,
                   const int32_t* full, double pad_value, int64_t out_len,
                   int64_t cols, float* out, int32_t* status) {
  std::vector<std::function<void()>> jobs;
  jobs.reserve(n);
  for (int64_t b = 0; b < n; ++b) {
    jobs.emplace_back([=] {
      float* dst = out + b * out_len * cols;
      NpyView v = open_npy(paths[b]);
      int64_t copied = 0;
      if (v.ok && v.cols == cols) {
        int64_t r0 = 0, r1 = v.rows;
        bool crop_ok = true;
        if (!full[b]) {
          crop_ok = crop_range(v.rows, starts[b], ends[b], durations[b],
                               &r0, &r1);
        }
        int64_t take =
            crop_ok ? std::min<int64_t>(r1 - r0, out_len) : 0;
        if (take > 0) {
          copy_rows(v, r0, r0 + take, dst);
          copied = take;
          status[b] = 0;
        } else {
          status[b] = 1;  // degenerate crop -> zero fill
        }
      } else {
        status[b] = 1;    // missing file -> zero fill
      }
      if (status[b] == 1) {
        memset(dst, 0, cols * sizeof(float));  // one zero feature row
        copied = 1;
      }
      // pad the tail
      float pv = static_cast<float>(pad_value);
      float* tail = dst + copied * cols;
      int64_t tail_n = (out_len - copied) * cols;
      if (pv == 0.0f) {
        memset(tail, 0, tail_n * sizeof(float));
      } else {
        for (int64_t i = 0; i < tail_n; ++i) tail[i] = pv;
      }
      close_npy(v);
    });
  }
  pool()->run(std::move(jobs));
  return 0;
}

int bmt_io_version() { return 1; }

}  // extern "C"
