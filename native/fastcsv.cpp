// Fast CSV parsers for the session input files (C++ runtime component).
//
// Counterpart of the reference's use of fast-cpp-csv-parser for IMU sample
// files (lib/motion/imu_types/ImuDataReader.cpp) and the point-observation
// reader (interfaces/ark/point_observation/PointObservationReader.cpp):
// a 30-minute recording has ~2M IMU rows and ~1M observation rows per file,
// which numpy.genfromtxt parses ~50x slower than this single-pass scanner.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image); the
// caller allocates numpy arrays and passes raw pointers (two-pass:
// count, then fill).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct FileBuf {
  std::string data;
  bool ok = false;
  explicit FileBuf(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    data.resize(size);
    ok = std::fread(data.data(), 1, size, f) == static_cast<size_t>(size);
    std::fclose(f);
  }
};

// parse a double, advancing p past the field and its delimiter
inline double next_double(const char*& p, const char* end) {
  char* q = nullptr;
  double v = std::strtod(p, &q);
  p = q;
  while (p < end && (*p == ',' || *p == ' ')) ++p;
  return v;
}

inline long long next_ll(const char*& p, const char* end) {
  char* q = nullptr;
  long long v = std::strtoll(p, &q, 10);
  p = q;
  // a float timestamp (e.g. "123.0") — consume the fraction
  if (p < end && *p == '.') {
    std::strtod(p, &q);
    p = q;
  }
  while (p < end && (*p == ',' || *p == ' ')) ++p;
  return v;
}

inline const char* line_end(const char* p, const char* end) {
  const char* nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
  return nl ? nl : end;
}

long count_data_lines(const FileBuf& fb) {
  if (!fb.ok || fb.data.empty()) return -1;
  long n = 0;
  const char* p = fb.data.data();
  const char* end = p + fb.data.size();
  // skip header line
  p = line_end(p, end);
  if (p < end) ++p;
  while (p < end) {
    const char* nl = line_end(p, end);
    if (nl > p && *p != '#') ++n;
    p = nl + 1;
  }
  return n;
}

}  // namespace

extern "C" {

// EuRoC IMU CSV: #timestamp [ns], temperature, w_xyz, a_xyz
long imu_csv_count(const char* path) {
  FileBuf fb(path);
  return count_data_lines(fb);
}

int imu_csv_parse(const char* path, long n, long long* t_ns, double* gyro,
                  double* accel) {
  FileBuf fb(path);
  if (!fb.ok) return -1;
  const char* p = fb.data.data();
  const char* end = p + fb.data.size();
  p = line_end(p, end);
  if (p < end) ++p;
  long i = 0;
  while (p < end && i < n) {
    const char* nl = line_end(p, end);
    if (nl > p && *p != '#') {
      t_ns[i] = next_ll(p, nl);
      next_double(p, nl);  // temperature
      gyro[i * 3 + 0] = next_double(p, nl);
      gyro[i * 3 + 1] = next_double(p, nl);
      gyro[i * 3 + 2] = next_double(p, nl);
      accel[i * 3 + 0] = next_double(p, nl);
      accel[i * 3 + 1] = next_double(p, nl);
      accel[i * 3 + 2] = next_double(p, nl);
      ++i;
    }
    p = nl + 1;
  }
  return i == n ? 0 : -2;
}

// session_observations.csv: point_id, capture_timestamp_ns, camera_index,
// projection_base_res_x/y, sqrt_h_base_res_00/01/10/11
long obs_csv_count(const char* path) {
  FileBuf fb(path);
  return count_data_lines(fb);
}

int obs_csv_parse(const char* path, long n, long long* point_id,
                  long long* ts_ns, int* cam, double* uv, double* sqrt_h) {
  FileBuf fb(path);
  if (!fb.ok) return -1;
  const char* p = fb.data.data();
  const char* end = p + fb.data.size();
  p = line_end(p, end);
  if (p < end) ++p;
  long i = 0;
  while (p < end && i < n) {
    const char* nl = line_end(p, end);
    if (nl > p && *p != '#') {
      point_id[i] = next_ll(p, nl);
      ts_ns[i] = next_ll(p, nl);
      cam[i] = static_cast<int>(next_ll(p, nl));
      uv[i * 2 + 0] = next_double(p, nl);
      uv[i * 2 + 1] = next_double(p, nl);
      sqrt_h[i * 4 + 0] = next_double(p, nl);
      sqrt_h[i * 4 + 1] = next_double(p, nl);
      sqrt_h[i * 4 + 2] = next_double(p, nl);
      sqrt_h[i * 4 + 3] = next_double(p, nl);
      ++i;
    }
    p = nl + 1;
  }
  return i == n ? 0 : -2;
}

// generic numeric CSV (trajectory files): fills row-major [n, n_cols],
// non-numeric fields parse as their leading number or 0 (uid columns are
// re-read by the python side when needed)
long num_csv_count(const char* path) {
  FileBuf fb(path);
  return count_data_lines(fb);
}

int num_csv_parse(const char* path, long n, int n_cols, double* out) {
  FileBuf fb(path);
  if (!fb.ok) return -1;
  const char* p = fb.data.data();
  const char* end = p + fb.data.size();
  p = line_end(p, end);
  if (p < end) ++p;
  long i = 0;
  while (p < end && i < n) {
    const char* nl = line_end(p, end);
    if (nl > p && *p != '#') {
      const char* q = p;
      for (int c = 0; c < n_cols; ++c) {
        char* adv = nullptr;
        double v = std::strtod(q, &adv);
        if (adv == q) {  // non-numeric field: skip to next comma
          const char* comma =
              static_cast<const char*>(std::memchr(q, ',', nl - q));
          q = comma ? comma : nl;
          v = 0.0;
        } else {
          q = adv;
        }
        if (q < nl && *q == ',') ++q;
        out[i * n_cols + c] = v;
      }
      ++i;
    }
    p = nl + 1;
  }
  return i == n ? 0 : -2;
}

}  // extern "C"
