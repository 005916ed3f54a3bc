// Native mesh processing: grid-clustering LOD simplification.
//
// The reference generates <=6 LODs per streamed mesh with meshoptimizer's
// simplify_sloppy (scene_loader.rs:739-756) — vertex-clustering
// simplification. Same algorithm family here: snap vertices to a uniform
// grid over the mesh AABB, collapse each occupied cell onto a REPRESENTATIVE
// original vertex (first seen), drop triangles that degenerate. Keeping
// original vertices means every LOD indexes the same consolidated vertex
// pool — exactly what MeshLibrary's LOD directory requires. O(V + T).
//
// Exposed as a C ABI for ctypes (pybind11 is not available in this image).

#include <cstddef>
#include <cstdint>
#include <unordered_map>

namespace {

struct CellKey {
  int32_t x, y, z;
  bool operator==(const CellKey& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};

struct CellHash {
  size_t operator()(const CellKey& k) const {
    return static_cast<size_t>(k.x) * 73856093u ^
           static_cast<size_t>(k.y) * 19349663u ^
           static_cast<size_t>(k.z) * 83492791u;
  }
};

}  // namespace

extern "C" {

// positions: (v_count, 3) f32; indices: (t_count, 3) i32.
// out_indices: capacity t_count rows; out_t_count receives the new count.
// Returns 0 on success.
int rtpu_simplify_cluster(
    const float* positions, int64_t v_count,
    const int32_t* indices, int64_t t_count,
    int32_t grid_size,
    int32_t* out_indices, int64_t* out_t_count) {
  if (!positions || !indices || !out_indices || !out_t_count ||
      v_count <= 0 || t_count < 0 || grid_size < 1)
    return -1;

  float mn[3] = {positions[0], positions[1], positions[2]};
  float mx[3] = {positions[0], positions[1], positions[2]};
  for (int64_t i = 0; i < v_count; ++i) {
    for (int c = 0; c < 3; ++c) {
      float p = positions[i * 3 + c];
      if (p < mn[c]) mn[c] = p;
      if (p > mx[c]) mx[c] = p;
    }
  }
  float inv[3];
  for (int c = 0; c < 3; ++c) {
    float ext = mx[c] - mn[c];
    inv[c] = ext > 0 ? static_cast<float>(grid_size) / ext : 0.0f;
  }

  // cell -> representative original vertex (first seen)
  std::unordered_map<CellKey, int32_t, CellHash> rep;
  rep.reserve(static_cast<size_t>(v_count));
  std::unordered_map<int32_t, int32_t> remap;  // vertex -> representative
  remap.reserve(static_cast<size_t>(v_count));

  for (int64_t i = 0; i < v_count; ++i) {
    CellKey k;
    for (int c = 0; c < 3; ++c) {
      float t = (positions[i * 3 + c] - mn[c]) * inv[c];
      int32_t gi = static_cast<int32_t>(t);
      if (gi >= grid_size) gi = grid_size - 1;
      if (gi < 0) gi = 0;
      (c == 0 ? k.x : c == 1 ? k.y : k.z) = gi;
    }
    auto it = rep.find(k);
    if (it == rep.end()) {
      rep.emplace(k, static_cast<int32_t>(i));
      remap[static_cast<int32_t>(i)] = static_cast<int32_t>(i);
    } else {
      remap[static_cast<int32_t>(i)] = it->second;
    }
  }

  int64_t t_out = 0;
  for (int64_t t = 0; t < t_count; ++t) {
    int32_t a = remap[indices[t * 3 + 0]];
    int32_t b = remap[indices[t * 3 + 1]];
    int32_t c = remap[indices[t * 3 + 2]];
    if (a == b || b == c || a == c) continue;  // collapsed
    out_indices[t_out * 3 + 0] = a;
    out_indices[t_out * 3 + 1] = b;
    out_indices[t_out * 3 + 2] = c;
    ++t_out;
  }
  *out_t_count = t_out;
  return 0;
}

}  // extern "C"
