// Native host-side runtime components.
//
// TPU-native counterpart of the reference's C++ host layers that remain
// host-side in this framework: the geometry particle fillers
// (src/geometries/*.cc Fill/FillIn) and the VTU writer encoder
// (src/writers/VTKWriter.cc).  The numerics live in XLA/Pallas; these
// routines handle scene setup and write-out for multi-million particle
// scenes at native speed.  Exposed through a plain C ABI consumed via
// ctypes (gpusph_tpu/native.py).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_set>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Geometry fills.  All fills return the number of points written; call with
// out == nullptr to query the required capacity.
// ---------------------------------------------------------------------------

static inline int64_t lattice_n(double lo, double hi, double dp) {
  double span = hi - lo;
  int64_t n = (int64_t)std::floor(span / dp + 1e-6) + 1;
  return n < 1 ? 1 : n;
}

static inline double lattice_start(double lo, double hi, double dp,
                                   int64_t n) {
  double span = hi - lo;
  return lo + (span - (double)(n - 1) * dp) / 2.0;
}

// Solid axis-aligned box fill on a dp lattice (reference Cube::Fill).
int64_t fill_box(const double* origin, const double* size, double dp,
                 double* out) {
  int64_t nx = lattice_n(origin[0], origin[0] + size[0], dp);
  int64_t ny = lattice_n(origin[1], origin[1] + size[1], dp);
  int64_t nz = lattice_n(origin[2], origin[2] + size[2], dp);
  int64_t total = nx * ny * nz;
  if (!out) return total;
  double x0 = lattice_start(origin[0], origin[0] + size[0], dp, nx);
  double y0 = lattice_start(origin[1], origin[1] + size[1], dp, ny);
  double z0 = lattice_start(origin[2], origin[2] + size[2], dp, nz);
  double* p = out;
  for (int64_t i = 0; i < nx; ++i)
    for (int64_t j = 0; j < ny; ++j)
      for (int64_t k = 0; k < nz; ++k) {
        *p++ = x0 + i * dp;
        *p++ = y0 + j * dp;
        *p++ = z0 + k * dp;
      }
  return total;
}

// Solid sphere fill (reference Sphere::Fill).
int64_t fill_sphere(const double* center, double radius, double dp,
                    double* out) {
  double origin[3] = {center[0] - radius, center[1] - radius,
                      center[2] - radius};
  double size[3] = {2 * radius, 2 * radius, 2 * radius};
  int64_t nx = lattice_n(origin[0], origin[0] + size[0], dp);
  int64_t ny = lattice_n(origin[1], origin[1] + size[1], dp);
  int64_t nz = lattice_n(origin[2], origin[2] + size[2], dp);
  double x0 = lattice_start(origin[0], origin[0] + size[0], dp, nx);
  double y0 = lattice_start(origin[1], origin[1] + size[1], dp, ny);
  double z0 = lattice_start(origin[2], origin[2] + size[2], dp, nz);
  double r2 = radius * radius + 1e-9;
  int64_t count = 0;
  double* p = out;
  for (int64_t i = 0; i < nx; ++i)
    for (int64_t j = 0; j < ny; ++j)
      for (int64_t k = 0; k < nz; ++k) {
        double x = x0 + i * dp, y = y0 + j * dp, z = z0 + k * dp;
        double dx = x - center[0], dy = y - center[1], dz = z - center[2];
        if (dx * dx + dy * dy + dz * dz <= r2) {
          if (out) {
            *p++ = x;
            *p++ = y;
            *p++ = z;
          }
          ++count;
        }
      }
  return count;
}

// Deduplicate lattice points within dp/2 buckets (geometry union seams).
// In-place compaction; returns the deduplicated count.
int64_t dedup_points(double* pts, int64_t n, double dp) {
  struct Key {
    int64_t x, y, z;
    bool operator==(const Key& o) const {
      return x == o.x && y == o.y && z == o.z;
    }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      size_t h = (size_t)k.x * 73856093u;
      h ^= (size_t)k.y * 19349663u;
      h ^= (size_t)k.z * 83492791u;
      return h;
    }
  };
  std::unordered_set<Key, KeyHash> seen;
  seen.reserve((size_t)n * 2);
  double inv = 2.0 / dp;
  int64_t w = 0;
  for (int64_t i = 0; i < n; ++i) {
    Key k{(int64_t)std::llround(pts[3 * i] * inv),
          (int64_t)std::llround(pts[3 * i + 1] * inv),
          (int64_t)std::llround(pts[3 * i + 2] * inv)};
    if (seen.insert(k).second) {
      if (w != i) memcpy(pts + 3 * w, pts + 3 * i, 3 * sizeof(double));
      ++w;
    }
  }
  return w;
}

// ---------------------------------------------------------------------------
// VTU writer: assemble and write a full .vtu file (appended raw encoding)
// in one native pass (reference VTKWriter.cc).
// ---------------------------------------------------------------------------

struct VtuField {
  const char* name;
  const char* vtk_type;  // "Float32", "UInt32", ...
  const uint8_t* data;
  int64_t bytes;
  int32_t ncomp;
};

// write a complete VTU file: positions [n,3] f32 + nfields point-data arrays.
// Returns 0 on success.
int32_t write_vtu(const char* path, int64_t n, const float* pos,
                  int32_t nfields, const char** names, const char** types,
                  const uint8_t** datas, const int64_t* bytes,
                  const int32_t* ncomps) {
  std::string header;
  header.reserve(4096);
  std::vector<int64_t> offsets;
  int64_t off = 0;
  auto add_off = [&](int64_t sz) {
    offsets.push_back(off);
    off += 8 + sz;  // 64-bit size prefix? -> we use 32-bit below
  };
  // recompute with 4-byte length prefixes (VTK UInt32 header type)
  offsets.clear();
  off = 0;
  auto add_off32 = [&](int64_t sz) {
    offsets.push_back(off);
    off += 4 + sz;
  };
  for (int32_t f = 0; f < nfields; ++f) add_off32(bytes[f]);
  int64_t pos_off;
  pos_off = off;
  off += 4 + n * 3 * (int64_t)sizeof(float);
  int64_t conn_off = off;
  off += 4 + n * (int64_t)sizeof(int32_t);
  int64_t offs_off = off;
  off += 4 + n * (int64_t)sizeof(int32_t);
  int64_t types_off = off;
  off += 4 + n;

  char buf[512];
  header += "<?xml version=\"1.0\"?>\n";
  header +=
      "<VTKFile type=\"UnstructuredGrid\" version=\"0.1\" "
      "byte_order=\"LittleEndian\">\n <UnstructuredGrid>\n";
  snprintf(buf, sizeof buf,
           "  <Piece NumberOfPoints=\"%lld\" NumberOfCells=\"%lld\">\n",
           (long long)n, (long long)n);
  header += buf;
  header += "   <PointData>\n";
  for (int32_t f = 0; f < nfields; ++f) {
    snprintf(buf, sizeof buf,
             "    <DataArray Name=\"%s\" type=\"%s\" "
             "NumberOfComponents=\"%d\" format=\"appended\" "
             "offset=\"%lld\"/>\n",
             names[f], types[f], ncomps[f], (long long)offsets[f]);
    header += buf;
  }
  header += "   </PointData>\n   <Points>\n";
  snprintf(buf, sizeof buf,
           "    <DataArray type=\"Float32\" NumberOfComponents=\"3\" "
           "format=\"appended\" offset=\"%lld\"/>\n",
           (long long)pos_off);
  header += buf;
  header += "   </Points>\n   <Cells>\n";
  snprintf(buf, sizeof buf,
           "    <DataArray Name=\"connectivity\" type=\"Int32\" "
           "format=\"appended\" offset=\"%lld\"/>\n",
           (long long)conn_off);
  header += buf;
  snprintf(buf, sizeof buf,
           "    <DataArray Name=\"offsets\" type=\"Int32\" "
           "format=\"appended\" offset=\"%lld\"/>\n",
           (long long)offs_off);
  header += buf;
  snprintf(buf, sizeof buf,
           "    <DataArray Name=\"types\" type=\"UInt8\" format=\"appended\" "
           "offset=\"%lld\"/>\n",
           (long long)types_off);
  header += buf;
  header += "   </Cells>\n  </Piece>\n </UnstructuredGrid>\n";
  header += " <AppendedData encoding=\"raw\">\n  _";

  FILE* fp = fopen(path, "wb");
  if (!fp) return -1;
  fwrite(header.data(), 1, header.size(), fp);

  auto write_block = [&](const void* data, int64_t sz) {
    uint32_t len = (uint32_t)sz;
    fwrite(&len, 4, 1, fp);
    fwrite(data, 1, (size_t)sz, fp);
  };
  for (int32_t f = 0; f < nfields; ++f) write_block(datas[f], bytes[f]);
  write_block(pos, n * 3 * (int64_t)sizeof(float));
  {
    std::vector<int32_t> tmp((size_t)n);
    for (int64_t i = 0; i < n; ++i) tmp[(size_t)i] = (int32_t)i;
    write_block(tmp.data(), n * (int64_t)sizeof(int32_t));
    for (int64_t i = 0; i < n; ++i) tmp[(size_t)i] = (int32_t)(i + 1);
    write_block(tmp.data(), n * (int64_t)sizeof(int32_t));
  }
  {
    std::vector<uint8_t> tmp((size_t)n, 1);  // VTK_VERTEX
    write_block(tmp.data(), n);
  }
  const char* tail = "\n </AppendedData>\n</VTKFile>\n";
  fwrite(tail, 1, strlen(tail), fp);
  fclose(fp);
  return 0;
}

}  // extern "C"
