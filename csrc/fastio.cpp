// Native sample-export kernel for general-mcmc-tpu.
//
// The reference's io layer is native (Rust csv/arrow/parquet writers,
// io/csv.rs:47-147); this is the counterpart for the rebuilt framework: a
// buffered CSV serializer using C++17 std::to_chars for shortest
// round-trip float formatting, which outruns Python-side formatting by a
// wide margin on multi-GB sample dumps.  Schema matches io/csv.rs:54-56:
// chain:u32, observation:u32, dim_0..dim_{D-1}.
//
// Exposed via a C ABI for ctypes (no pybind11 in the build image).

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr size_t kBufCap = 1 << 20;  // 1 MiB write buffer

struct Buffer {
  FILE* f;
  std::vector<char> buf;
  explicit Buffer(FILE* file) : f(file) { buf.reserve(kBufCap); }
  bool flush() {
    if (buf.empty()) return true;
    size_t n = fwrite(buf.data(), 1, buf.size(), f);
    bool ok = n == buf.size();
    buf.clear();
    return ok;
  }
  bool put(const char* data, size_t n) {
    if (buf.size() + n > kBufCap && !flush()) return false;
    buf.insert(buf.end(), data, data + n);
    return true;
  }
  bool put_char(char c) { return put(&c, 1); }
  bool put_u32(uint32_t v) {
    char tmp[16];
    auto [p, ec] = std::to_chars(tmp, tmp + sizeof(tmp), v);
    return put(tmp, static_cast<size_t>(p - tmp));
  }
  bool put_f64(double v) {
    char tmp[32];
    auto [p, ec] = std::to_chars(tmp, tmp + sizeof(tmp), v);
    if (ec != std::errc()) return false;
    return put(tmp, static_cast<size_t>(p - tmp));
  }
};

}  // namespace

extern "C" {

// Writes [n_chains, n_obs, n_dims] row-major doubles as CSV.
// Returns 0 on success, nonzero on I/O error.
int gmt_write_csv(const double* data, uint32_t n_chains, uint32_t n_obs,
                  uint32_t n_dims, const char* path) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  Buffer out(f);

  bool ok = out.put("chain,observation", 17);
  char head[32];
  for (uint32_t d = 0; ok && d < n_dims; ++d) {
    int n = snprintf(head, sizeof(head), ",dim_%u", d);
    ok = out.put(head, static_cast<size_t>(n));
  }
  ok = ok && out.put_char('\n');

  const double* p = data;
  for (uint32_t c = 0; ok && c < n_chains; ++c) {
    for (uint32_t o = 0; ok && o < n_obs; ++o) {
      ok = out.put_u32(c) && out.put_char(',') && out.put_u32(o);
      for (uint32_t d = 0; ok && d < n_dims; ++d) {
        ok = out.put_char(',') && out.put_f64(*p++);
      }
      ok = ok && out.put_char('\n');
    }
  }
  ok = out.flush() && ok;
  return (fclose(f) == 0 && ok) ? 0 : 2;
}

}  // extern "C"
