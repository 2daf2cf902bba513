// Native COLMAP binary-model reader.
//
// The pure-python readers in neuray_tpu/data/colmap_io.py walk the file
// with struct.unpack per record — minutes for multi-million-point
// points3D.bin files. This C++ reader parses the same documented format
// (https://colmap.github.io/format.html) into flat arrays handed back
// through a C ABI (ctypes on the python side; colmap_io picks it up
// automatically when the shared library is built — see native/Makefile).
//
// The reference system vendors COLMAP's own python scripts for this
// (reference colmap/read_write_model.py); this is the TPU framework's
// native-runtime equivalent for the data-ingest path.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Buf {
  std::vector<uint8_t> data;
  size_t pos = 0;

  bool load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    data.resize(static_cast<size_t>(size));
    size_t got = std::fread(data.data(), 1, data.size(), f);
    std::fclose(f);
    return got == data.size();
  }

  template <typename T>
  T read() {
    T v;
    std::memcpy(&v, data.data() + pos, sizeof(T));
    pos += sizeof(T);
    return v;
  }

  void skip(size_t n) { pos += n; }

  std::string read_cstr() {
    std::string s;
    while (pos < data.size() && data[pos] != 0) {
      s.push_back(static_cast<char>(data[pos++]));
    }
    ++pos;  // the NUL
    return s;
  }
};

// camera_model_id -> num_params (mirrors COLMAP's model table)
int camera_num_params(int model_id) {
  static const int table[] = {3, 4, 4, 5, 8, 8, 12, 5, 4, 5, 12};
  if (model_id < 0 || model_id > 10) return -1;
  return table[model_id];
}

}  // namespace

extern "C" {

// ---------------- points3D.bin ----------------

// First pass: returns the number of points and the total track length,
// or -1 on error.
long long colmap_points3d_counts(const char* path, long long* total_track) {
  Buf buf;
  if (!buf.load(path)) return -1;
  const uint64_t n = buf.read<uint64_t>();
  uint64_t track_total = 0;
  for (uint64_t i = 0; i < n; ++i) {
    buf.skip(8 + 3 * 8 + 3 + 8);  // id, xyz, rgb, error
    const uint64_t track_len = buf.read<uint64_t>();
    track_total += track_len;
    buf.skip(track_len * 8);
    if (buf.pos > buf.data.size()) return -1;
  }
  *total_track = static_cast<long long>(track_total);
  return static_cast<long long>(n);
}

// Second pass: fills caller-allocated arrays.
//   ids[n], xyz[n*3], rgb[n*3], error[n],
//   track_offsets[n+1], track_image_ids[total_track],
//   track_p2d_idxs[total_track]
int colmap_points3d_read(const char* path, long long* ids, double* xyz,
                         uint8_t* rgb, double* error,
                         long long* track_offsets,
                         int* track_image_ids, int* track_p2d_idxs) {
  Buf buf;
  if (!buf.load(path)) return -1;
  const uint64_t n = buf.read<uint64_t>();
  long long track_pos = 0;
  for (uint64_t i = 0; i < n; ++i) {
    ids[i] = static_cast<long long>(buf.read<uint64_t>());
    for (int k = 0; k < 3; ++k) xyz[i * 3 + k] = buf.read<double>();
    for (int k = 0; k < 3; ++k) rgb[i * 3 + k] = buf.read<uint8_t>();
    error[i] = buf.read<double>();
    const uint64_t track_len = buf.read<uint64_t>();
    track_offsets[i] = track_pos;
    for (uint64_t t = 0; t < track_len; ++t) {
      track_image_ids[track_pos] = buf.read<int32_t>();
      track_p2d_idxs[track_pos] = buf.read<int32_t>();
      ++track_pos;
    }
  }
  track_offsets[n] = track_pos;
  return 0;
}

// ---------------- images.bin ----------------

// First pass: number of images, total 2D points, total name bytes
// (incl. one NUL per name).
long long colmap_images_counts(const char* path, long long* total_p2d,
                               long long* total_name_bytes) {
  Buf buf;
  if (!buf.load(path)) return -1;
  const uint64_t n = buf.read<uint64_t>();
  uint64_t p2d_total = 0, name_total = 0;
  for (uint64_t i = 0; i < n; ++i) {
    buf.skip(4 + 4 * 8 + 3 * 8 + 4);  // id, qvec, tvec, camera_id
    std::string name = buf.read_cstr();
    name_total += name.size() + 1;
    const uint64_t n2d = buf.read<uint64_t>();
    p2d_total += n2d;
    buf.skip(n2d * 24);
    if (buf.pos > buf.data.size()) return -1;
  }
  *total_p2d = static_cast<long long>(p2d_total);
  *total_name_bytes = static_cast<long long>(name_total);
  return static_cast<long long>(n);
}

// Second pass:
//   image_ids[n], qvecs[n*4], tvecs[n*3], camera_ids[n],
//   names[nbytes] (NUL-separated), p2d_offsets[n+1],
//   xys[total_p2d*2], p3d_ids[total_p2d]
int colmap_images_read(const char* path, int* image_ids, double* qvecs,
                       double* tvecs, int* camera_ids, char* names,
                       long long* p2d_offsets, double* xys,
                       long long* p3d_ids) {
  Buf buf;
  if (!buf.load(path)) return -1;
  const uint64_t n = buf.read<uint64_t>();
  long long p2d_pos = 0;
  size_t name_pos = 0;
  for (uint64_t i = 0; i < n; ++i) {
    image_ids[i] = buf.read<int32_t>();
    for (int k = 0; k < 4; ++k) qvecs[i * 4 + k] = buf.read<double>();
    for (int k = 0; k < 3; ++k) tvecs[i * 3 + k] = buf.read<double>();
    camera_ids[i] = buf.read<int32_t>();
    std::string name = buf.read_cstr();
    std::memcpy(names + name_pos, name.c_str(), name.size() + 1);
    name_pos += name.size() + 1;
    const uint64_t n2d = buf.read<uint64_t>();
    p2d_offsets[i] = p2d_pos;
    for (uint64_t t = 0; t < n2d; ++t) {
      xys[p2d_pos * 2 + 0] = buf.read<double>();
      xys[p2d_pos * 2 + 1] = buf.read<double>();
      p3d_ids[p2d_pos] = buf.read<int64_t>();
      ++p2d_pos;
    }
  }
  p2d_offsets[n] = p2d_pos;
  return 0;
}

// ---------------- cameras.bin ----------------

// Single pass: caller provides arrays sized for max cameras
// (cam_ids[n], model_ids[n], widths[n], heights[n], params[n*12]).
// Returns the camera count or -1.
long long colmap_cameras_read(const char* path, int* cam_ids,
                              int* model_ids, long long* widths,
                              long long* heights, double* params) {
  Buf buf;
  if (!buf.load(path)) return -1;
  const uint64_t n = buf.read<uint64_t>();
  for (uint64_t i = 0; i < n; ++i) {
    cam_ids[i] = buf.read<int32_t>();
    model_ids[i] = buf.read<int32_t>();
    widths[i] = static_cast<long long>(buf.read<uint64_t>());
    heights[i] = static_cast<long long>(buf.read<uint64_t>());
    const int np = camera_num_params(model_ids[i]);
    if (np < 0) return -1;
    for (int k = 0; k < 12; ++k) params[i * 12 + k] = 0.0;
    for (int k = 0; k < np; ++k) params[i * 12 + k] = buf.read<double>();
  }
  return static_cast<long long>(n);
}

long long colmap_cameras_count(const char* path) {
  Buf buf;
  if (!buf.load(path)) return -1;
  return static_cast<long long>(buf.read<uint64_t>());
}

}  // extern "C"
