// scenekit — native scene-IO/build helpers for the TPU renderer.
//
// The reference keeps its heavy host-side work in C++ (SceneBuilder, BLAS
// build, importers — Source/Falcor/Scene/*); the TPU port keeps GPU work in
// XLA/Pallas and uses this small native library for the CPU-bound pieces:
//   * Wavefront OBJ triangle-soup parsing (v/f/usemtl; fan triangulation),
//   * 30-bit Morton codes over triangle centroids (the LBVH build key,
//     Karras 2012 — consumed by the BVH builder).
//
// Exposed through a plain C ABI consumed via ctypes (no pybind11 in the
// image).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> tri_pos;   // ntris * 9
  std::vector<int32_t> mat_id;  // ntris
  std::string mat_names;        // '\n'-joined
  bool has_normals_or_uvs = false;
};

}  // namespace

extern "C" {

// Parses positions + faces + usemtl. Returns an opaque handle (or null).
void* scenekit_parse_obj(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* d = new ObjData();
  std::vector<float> verts;  // xyz
  std::vector<std::string> mats;
  int32_t cur_mat = 0;
  char line[4096];
  while (std::fgets(line, sizeof(line), f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      float x, y, z;
      if (std::sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
        verts.push_back(x);
        verts.push_back(y);
        verts.push_back(z);
      }
    } else if (line[0] == 'v' && (line[1] == 'n' || line[1] == 't')) {
      d->has_normals_or_uvs = true;
    } else if (std::strncmp(line, "usemtl", 6) == 0) {
      char name[512];
      if (std::sscanf(line + 6, "%511s", name) == 1) {
        std::string s(name);
        int32_t idx = -1;
        for (size_t i = 0; i < mats.size(); ++i)
          if (mats[i] == s) { idx = (int32_t)i; break; }
        if (idx < 0) { mats.push_back(s); idx = (int32_t)mats.size() - 1; }
        cur_mat = idx;
      }
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      // collect vertex indices (ignore /vt /vn parts)
      std::vector<int64_t> idx;
      const char* p = line + 2;
      while (*p) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\0' || *p == '\n' || *p == '\r') break;
        long v = std::strtol(p, const_cast<char**>(&p), 10);
        if (v < 0) v = (long)(verts.size() / 3) + v + 1;
        idx.push_back(v);
        while (*p && *p != ' ' && *p != '\t' && *p != '\n') ++p;  // skip /..
      }
      for (size_t i = 1; i + 1 < idx.size(); ++i) {
        const int64_t tri[3] = {idx[0], idx[i], idx[i + 1]};
        for (int k = 0; k < 3; ++k) {
          int64_t vi = (tri[k] - 1) * 3;
          if (vi < 0 || vi + 2 >= (int64_t)verts.size()) { vi = 0; }
          d->tri_pos.push_back(verts[vi]);
          d->tri_pos.push_back(verts[vi + 1]);
          d->tri_pos.push_back(verts[vi + 2]);
        }
        d->mat_id.push_back(cur_mat);
      }
    }
  }
  std::fclose(f);
  for (auto& m : mats) {
    d->mat_names += m;
    d->mat_names += '\n';
  }
  return d;
}

int64_t scenekit_num_tris(void* h) {
  return ((ObjData*)h)->mat_id.size();
}

int scenekit_has_extras(void* h) {
  return ((ObjData*)h)->has_normals_or_uvs ? 1 : 0;
}

const float* scenekit_positions(void* h) { return ((ObjData*)h)->tri_pos.data(); }
const int32_t* scenekit_material_ids(void* h) { return ((ObjData*)h)->mat_id.data(); }
const char* scenekit_material_names(void* h) { return ((ObjData*)h)->mat_names.c_str(); }

void scenekit_free(void* h) { delete (ObjData*)h; }

// --- morton codes (LBVH keys; Karras 2012) --------------------------------
static inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

void scenekit_morton_codes(const float* centroids, int64_t n,
                           const float* bmin, const float* bmax,
                           uint32_t* out) {
  float ext[3];
  for (int k = 0; k < 3; ++k) {
    ext[k] = bmax[k] - bmin[k];
    if (ext[k] <= 0) ext[k] = 1.0f;
  }
  for (int64_t i = 0; i < n; ++i) {
    uint32_t code = 0;
    for (int k = 0; k < 3; ++k) {
      float x = (centroids[i * 3 + k] - bmin[k]) / ext[k];
      if (x < 0) x = 0;
      if (x > 1) x = 1;
      uint32_t q = (uint32_t)(x * 1023.0f);
      code |= expand_bits(q) << (2 - k);
    }
    out[i] = code;
  }
}

}  // extern "C"
