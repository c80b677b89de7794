// Native OBJ loader -> flat triangle soup (fan triangulation).
//
// C++ twin of radish_pt_tpu/scene/obj_loader.py replacing the vendored
// tinyobjloader the reference uses (/root/reference/src/scene.cpp:28-65);
// fresh implementation with the same semantics: indices expanded to a
// non-indexed per-corner soup, missing normals filled with face normals,
// missing texcoords zeroed.  Exposed via a C ABI handle protocol for ctypes.

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Mesh {
  std::vector<float> v;   // [3T * 3]
  std::vector<float> n;   // [3T * 3]
  std::vector<float> uv;  // [3T * 2]
};

struct Corner {
  int vi, ti, ni;
};

inline const char *skip_ws(const char *p) {
  while (*p == ' ' || *p == '\t') ++p;
  return p;
}

inline int fix_index(long i, size_t count) {
  return i > 0 ? (int)(i - 1) : (int)((long)count + i);
}

Mesh *parse(const char *path) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::vector<float> pos, nrm, tex;
  std::vector<Corner> corners;

  char line[4096];
  std::vector<Corner> face;
  while (std::fgets(line, sizeof(line), f)) {
    const char *p = skip_ws(line);
    if (p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      float x, y, z;
      if (std::sscanf(p + 1, "%f %f %f", &x, &y, &z) == 3) {
        pos.push_back(x);
        pos.push_back(y);
        pos.push_back(z);
      }
    } else if (p[0] == 'v' && p[1] == 'n') {
      float x, y, z;
      if (std::sscanf(p + 2, "%f %f %f", &x, &y, &z) == 3) {
        nrm.push_back(x);
        nrm.push_back(y);
        nrm.push_back(z);
      }
    } else if (p[0] == 'v' && p[1] == 't') {
      float u, w;
      if (std::sscanf(p + 2, "%f %f", &u, &w) >= 1) {
        tex.push_back(u);
        tex.push_back(w);
      }
    } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      face.clear();
      const char *q = p + 1;
      while (true) {
        q = skip_ws(q);
        if (*q == '\0' || *q == '\n' || *q == '\r' || *q == '#') break;
        char *end;
        long vi = std::strtol(q, &end, 10);
        if (end == q) break;
        Corner c{fix_index(vi, pos.size() / 3), -1, -1};
        q = end;
        if (*q == '/') {
          ++q;
          if (*q != '/') {
            long ti = std::strtol(q, &end, 10);
            if (end != q) c.ti = fix_index(ti, tex.size() / 2);
            q = end;
          }
          if (*q == '/') {
            ++q;
            long ni = std::strtol(q, &end, 10);
            if (end != q) c.ni = fix_index(ni, nrm.size() / 3);
            q = end;
          }
        }
        face.push_back(c);
      }
      for (size_t k = 1; k + 1 < face.size(); ++k) {
        corners.push_back(face[0]);
        corners.push_back(face[k]);
        corners.push_back(face[k + 1]);
      }
    }
  }
  std::fclose(f);
  if (corners.empty()) return nullptr;

  Mesh *m = new Mesh;
  size_t nc = corners.size();
  m->v.resize(nc * 3);
  m->n.resize(nc * 3);
  m->uv.resize(nc * 2, 0.f);

  for (size_t i = 0; i < nc; ++i) {
    const Corner &c = corners[i];
    std::memcpy(&m->v[i * 3], &pos[(size_t)c.vi * 3], 3 * sizeof(float));
    if (c.ti >= 0 && (size_t)c.ti * 2 + 1 < tex.size()) {
      m->uv[i * 2] = tex[(size_t)c.ti * 2];
      m->uv[i * 2 + 1] = tex[(size_t)c.ti * 2 + 1];
    }
    if (c.ni >= 0 && (size_t)c.ni * 3 + 2 < nrm.size()) {
      std::memcpy(&m->n[i * 3], &nrm[(size_t)c.ni * 3], 3 * sizeof(float));
    } else {
      m->n[i * 3] = NAN;  // marker: fill with face normal below
    }
  }
  // fill missing normals with face normals
  for (size_t t = 0; t < nc / 3; ++t) {
    float *a = &m->v[t * 9], *b = a + 3, *c = a + 6;
    float e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    float e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    float fn[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                   e1[2] * e2[0] - e1[0] * e2[2],
                   e1[0] * e2[1] - e1[1] * e2[0]};
    float len = std::sqrt(fn[0] * fn[0] + fn[1] * fn[1] + fn[2] * fn[2]);
    if (len > 1e-12f) {
      fn[0] /= len;
      fn[1] /= len;
      fn[2] /= len;
    }
    for (int k = 0; k < 3; ++k) {
      float *np = &m->n[(t * 3 + k) * 3];
      if (std::isnan(np[0])) std::memcpy(np, fn, 3 * sizeof(float));
    }
  }
  return m;
}

}  // namespace

extern "C" {

void *radish_obj_parse(const char *path) { return parse(path); }

int64_t radish_obj_num_corners(void *h) {
  return h ? (int64_t)(((Mesh *)h)->v.size() / 3) : 0;
}

void radish_obj_copy(void *h, float *v, float *n, float *uv) {
  Mesh *m = (Mesh *)h;
  std::memcpy(v, m->v.data(), m->v.size() * sizeof(float));
  std::memcpy(n, m->n.data(), m->n.size() * sizeof(float));
  std::memcpy(uv, m->uv.data(), m->uv.size() * sizeof(float));
}

void radish_obj_free(void *h) { delete (Mesh *)h; }
}
