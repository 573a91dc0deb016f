// Native runtime components for vegs_tpu (C ABI, loaded via ctypes).
//
// The reference's native layer is CUDA (rasterizer + simple-knn,
// SURVEY.md §2.3); on TPU the compute path is Pallas/XLA, so the native code
// here covers the HOST runtime instead: high-throughput binary PLY vertex
// ingestion for the multi-hundred-MB KITTI-360 point clouds, and the
// mean-squared-distance-to-3-nearest-neighbors used to seed Gaussian scales
// (simple_knn._C.distCUDA2 parity, reference scene/gaussian_model.py:140,517)
// as a uniform-grid spatial hash.
//
// Build: make -C native   (produces libvegs_native.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// KNN: mean squared distance to the k nearest neighbors (k=3), grid hash.
// ---------------------------------------------------------------------------

// Morton-free uniform grid: cell size = heuristic from bounding box so the
// expected occupancy is a few points per cell; each query scans its 3x3x3
// neighborhood, expanding the shell until k neighbors are guaranteed.
int vegs_knn_mean_sq_dist(const float* points, int64_t n, int k,
                          float* out /* [n] */) {
  if (n <= 0) return 0;
  if (n <= k) {
    for (int64_t i = 0; i < n; ++i) out[i] = 1e-4f;
    return 0;
  }
  float lo[3] = {points[0], points[1], points[2]};
  float hi[3] = {points[0], points[1], points[2]};
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      const float v = points[3 * i + d];
      lo[d] = std::min(lo[d], v);
      hi[d] = std::max(hi[d], v);
    }
  }
  const double vol =
      std::max(1e-12, double(hi[0] - lo[0]) * double(hi[1] - lo[1]) *
                          double(hi[2] - lo[2]));
  // ~4 points per cell on average.
  const float cell = float(std::cbrt(vol * 4.0 / double(n))) + 1e-12f;

  auto cell_of = [&](const float* p, int64_t c[3]) {
    for (int d = 0; d < 3; ++d)
      c[d] = int64_t(std::floor((p[d] - lo[d]) / cell));
  };
  auto key_of = [&](const int64_t c[3]) -> uint64_t {
    // 21 bits per axis, offset to stay positive.
    return ((uint64_t(c[0] & 0x1FFFFF)) << 42) |
           ((uint64_t(c[1] & 0x1FFFFF)) << 21) | uint64_t(c[2] & 0x1FFFFF);
  };

  // Bucket by counting sort over the hash map of occupied cells.
  std::unordered_map<uint64_t, std::vector<int32_t>> cells;
  cells.reserve(size_t(n) / 2);
  for (int64_t i = 0; i < n; ++i) {
    int64_t c[3];
    cell_of(points + 3 * i, c);
    cells[key_of(c)].push_back(int32_t(i));
  }

  const unsigned n_threads =
      std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int64_t> cursor{0};
  auto worker = [&]() {
    std::vector<float> best(k);
    for (;;) {
      const int64_t i = cursor.fetch_add(1024);
      if (i >= n) break;
      const int64_t iend = std::min(n, i + 1024);
      for (int64_t q = i; q < iend; ++q) {
        const float* p = points + 3 * q;
        int64_t c0[3];
        cell_of(p, c0);
        std::fill(best.begin(), best.end(),
                  std::numeric_limits<float>::infinity());
        int found = 0;
        for (int shell = 0; shell < 64; ++shell) {
          // Scan only the NEW cells at Chebyshev distance == shell; earlier
          // shells were already consumed (re-scanning would double-insert
          // the same neighbors into `best`).
          for (int64_t dx = -shell; dx <= shell; ++dx)
            for (int64_t dy = -shell; dy <= shell; ++dy)
              for (int64_t dz = -shell; dz <= shell; ++dz) {
                if (std::max({std::llabs(dx), std::llabs(dy),
                              std::llabs(dz)}) != shell)
                  continue;
                const int64_t c[3] = {c0[0] + dx, c0[1] + dy, c0[2] + dz};
                auto it = cells.find(key_of(c));
                if (it == cells.end()) continue;
                for (const int32_t j : it->second) {
                  if (j == q) continue;
                  const float* r = points + 3 * j;
                  const float d0 = p[0] - r[0], d1 = p[1] - r[1],
                              d2 = p[2] - r[2];
                  const float d = d0 * d0 + d1 * d1 + d2 * d2;
                  if (d < best[k - 1]) {
                    best[k - 1] = d;
                    for (int b = k - 1; b > 0 && best[b] < best[b - 1]; --b)
                      std::swap(best[b], best[b - 1]);
                  }
                }
              }
          found = 0;
          for (int b = 0; b < k; ++b)
            if (std::isfinite(best[b])) ++found;
          // All k found and the worst is inside the guaranteed radius:
          // a cube of cells [-s, s]^3 only guarantees coverage of points
          // within (s-1) cell widths of the query.
          const float guard = float(std::max(shell - 1, 0)) * cell;
          if (found >= k && best[k - 1] <= guard * guard) break;
        }
        float acc = 0.f;
        int cnt = 0;
        for (int b = 0; b < k; ++b)
          if (std::isfinite(best[b])) {
            acc += best[b];
            ++cnt;
          }
        out[q] = cnt ? acc / float(cnt) : 1e-4f;
      }
    }
  };
  std::vector<std::thread> pool;
  for (unsigned t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

// ---------------------------------------------------------------------------
// Binary PLY vertex ingestion.
// ---------------------------------------------------------------------------

// Parses a binary_little_endian PLY header, returning vertex count, the
// per-vertex stride, and up to max_props (offset, size) pairs for requested
// property names. Then extracts the requested properties as packed float32
// columns in one multithreaded pass. Supports float/double/uchar/int/uint
// scalar properties.

struct PropSpec {
  int64_t offset;
  int type;  // 0=f32 1=f64 2=u8 3=i32 4=u32 5=i16 6=u16 7=i8
};

static int type_size(int t) {
  switch (t) {
    case 0: return 4;
    case 1: return 8;
    case 2: return 1;
    case 3: return 4;
    case 4: return 4;
    case 5: return 2;
    case 6: return 2;
    case 7: return 1;
  }
  return 0;
}

static int parse_type(const std::string& s) {
  if (s == "float" || s == "float32") return 0;
  if (s == "double" || s == "float64") return 1;
  if (s == "uchar" || s == "uint8") return 2;
  if (s == "int" || s == "int32") return 3;
  if (s == "uint" || s == "uint32") return 4;
  if (s == "short" || s == "int16") return 5;
  if (s == "ushort" || s == "uint16") return 6;
  if (s == "char" || s == "int8") return 7;
  return -1;
}

// names: semicolon-separated property names. Returns number of vertices, or
// -1 on error. Writes column-major float32 into out[n * n_names].
int64_t vegs_read_ply_columns(const char* path, const char* names,
                              float* out, int64_t out_cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[4096];
  if (!std::fgets(line, sizeof line, f) || std::strncmp(line, "ply", 3)) {
    std::fclose(f);
    return -1;
  }
  int64_t n_vertex = -1;
  bool in_vertex = false;
  int64_t stride = 0;
  std::vector<std::string> prop_names;
  std::vector<PropSpec> props;
  bool little = true;
  for (;;) {
    if (!std::fgets(line, sizeof line, f)) {
      std::fclose(f);
      return -1;
    }
    std::string s(line);
    if (s.rfind("format", 0) == 0) {
      little = s.find("binary_little_endian") != std::string::npos;
      if (!little) {
        std::fclose(f);
        return -1;
      }
    } else if (s.rfind("element", 0) == 0) {
      char name[256];
      long long cnt;
      std::sscanf(line, "element %255s %lld", name, &cnt);
      in_vertex = std::strcmp(name, "vertex") == 0;
      if (in_vertex) n_vertex = cnt;
    } else if (s.rfind("property", 0) == 0 && in_vertex) {
      char type_s[64], name_s[256];
      if (std::sscanf(line, "property %63s %255s", type_s, name_s) == 2) {
        const int t = parse_type(type_s);
        if (t < 0) {
          std::fclose(f);
          return -1;  // list property in vertex element: unsupported
        }
        props.push_back({stride, t});
        prop_names.push_back(name_s);
        stride += type_size(t);
      }
    } else if (s.rfind("end_header", 0) == 0) {
      break;
    }
  }
  if (n_vertex < 0) {
    std::fclose(f);
    return -1;
  }

  // Resolve requested columns.
  std::vector<PropSpec> want;
  {
    std::string all(names);
    size_t pos = 0;
    while (pos <= all.size()) {
      size_t e = all.find(';', pos);
      if (e == std::string::npos) e = all.size();
      const std::string nm = all.substr(pos, e - pos);
      bool ok = false;
      for (size_t i = 0; i < prop_names.size(); ++i)
        if (prop_names[i] == nm) {
          want.push_back(props[i]);
          ok = true;
          break;
        }
      if (!ok) {
        std::fclose(f);
        return -2;  // missing property
      }
      pos = e + 1;
    }
  }
  const int64_t n_cols = int64_t(want.size());
  if (out_cap < n_vertex * n_cols) {
    std::fclose(f);
    return -3;
  }

  std::vector<uint8_t> buf(size_t(n_vertex) * size_t(stride));
  const size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return -1;

  const unsigned n_threads =
      std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> pool;
  const int64_t per = (n_vertex + n_threads - 1) / n_threads;
  for (unsigned t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      const int64_t i0 = int64_t(t) * per;
      const int64_t i1 = std::min(n_vertex, i0 + per);
      for (int64_t i = i0; i < i1; ++i) {
        const uint8_t* row = buf.data() + size_t(i) * size_t(stride);
        for (int64_t c = 0; c < n_cols; ++c) {
          const PropSpec& p = want[size_t(c)];
          const uint8_t* src = row + p.offset;
          float v = 0.f;
          switch (p.type) {
            case 0: { float x; std::memcpy(&x, src, 4); v = x; break; }
            case 1: { double x; std::memcpy(&x, src, 8); v = float(x); break; }
            case 2: { v = float(*src); break; }
            case 3: { int32_t x; std::memcpy(&x, src, 4); v = float(x); break; }
            case 4: { uint32_t x; std::memcpy(&x, src, 4); v = float(x); break; }
            case 5: { int16_t x; std::memcpy(&x, src, 2); v = float(x); break; }
            case 6: { uint16_t x; std::memcpy(&x, src, 2); v = float(x); break; }
            case 7: { v = float(*reinterpret_cast<const int8_t*>(src)); break; }
          }
          out[c * n_vertex + i] = v;
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  return n_vertex;
}

}  // extern "C"
