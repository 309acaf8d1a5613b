// awsm_host — native host-side runtime for awsm_renderer_tpu.
//
// The reference implements its entire host tier in Rust (scene stores,
// transform propagation, animation sampling, glTF conversion —
// crates/renderer/src/transforms.rs, animation/, gltf/buffers.rs). This
// library is the native equivalent for the per-frame hot loops that
// python/numpy handles poorly: scene-graph matrix propagation, TRS
// composition, animation keyframe sampling, and AABB transforms. Exposed
// via a plain C ABI consumed through ctypes (utils/native.py); every entry
// point has a numpy fallback so the renderer works without the .so.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>

#include <unordered_map>
#include <vector>

extern "C" {

// Compose TRS rows into 4x4 row-major matrices.
// trs: (n, 10) [tx ty tz qx qy qz qw sx sy sz]  ->  out: (n, 16)
void compose_trs(const float* trs, float* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    const float* p = trs + i * 10;
    float tx = p[0], ty = p[1], tz = p[2];
    float x = p[3], y = p[4], z = p[5], w = p[6];
    float sx = p[7], sy = p[8], sz = p[9];
    float x2 = x + x, y2 = y + y, z2 = z + z;
    float xx = x * x2, yy = y * y2, zz = z * z2;
    float xy = x * y2, xz = x * z2, yz = y * z2;
    float wx = w * x2, wy = w * y2, wz = w * z2;
    float* m = out + i * 16;
    m[0] = (1.f - (yy + zz)) * sx; m[1] = (xy - wz) * sy; m[2] = (xz + wy) * sz; m[3] = tx;
    m[4] = (xy + wz) * sx; m[5] = (1.f - (xx + zz)) * sy; m[6] = (yz - wx) * sz; m[7] = ty;
    m[8] = (xz - wy) * sx; m[9] = (yz + wx) * sy; m[10] = (1.f - (xx + yy)) * sz; m[11] = tz;
    m[12] = 0.f; m[13] = 0.f; m[14] = 0.f; m[15] = 1.f;
  }
}

static inline void mat4_mul(const float* a, const float* b, float* o) {
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c)
      o[r * 4 + c] = a[r * 4 + 0] * b[0 * 4 + c] + a[r * 4 + 1] * b[1 * 4 + c] +
                     a[r * 4 + 2] * b[2 * 4 + c] + a[r * 4 + 3] * b[3 * 4 + c];
}

// Inverse-transpose of the upper-left 3x3 (normal matrix), row-major 3x3 out.
static inline void normal_mat3(const float* m /*4x4*/, float* o /*3x3*/) {
  float a = m[0], b = m[1], c = m[2];
  float d = m[4], e = m[5], f = m[6];
  float g = m[8], h = m[9], i = m[10];
  float A = e * i - f * h, B = f * g - d * i, C = d * h - e * g;
  float det = a * A + b * B + c * C;
  if (std::fabs(det) < 1e-20f) {
    o[0] = 1; o[1] = 0; o[2] = 0; o[3] = 0; o[4] = 1; o[5] = 0; o[6] = 0; o[7] = 0; o[8] = 1;
    return;
  }
  float inv = 1.0f / det;
  // inverse (adjugate^T), then transpose again -> adjugate/det laid out as
  // inverse-transpose directly:
  o[0] = A * inv;                 o[1] = B * inv;                 o[2] = C * inv;
  o[3] = (c * h - b * i) * inv;   o[4] = (a * i - c * g) * inv;   o[5] = (b * g - a * h) * inv;
  o[6] = (b * f - c * e) * inv;   o[7] = (c * d - a * f) * inv;   o[8] = (a * e - b * d) * inv;
}

// Propagate world matrices through the scene graph.
// order: (n_order,) row indices in topological order (parents first)
// parent: (cap,) parent row per row, -1 = root
// local: (cap, 16) local matrices; world: (cap, 16) in/out;
// normal: (cap, 9) out; dirty: (cap,) u8 in; changed: (cap,) u8 out —
// changed[row] = dirty[row] | changed[parent].
void world_propagate(const int32_t* order, int64_t n_order,
                     const int32_t* parent, const float* local,
                     float* world, float* normal,
                     const uint8_t* dirty, uint8_t* changed) {
  for (int64_t k = 0; k < n_order; ++k) {
    int32_t row = order[k];
    int32_t par = parent[row];
    uint8_t ch = dirty[row] | (par >= 0 ? changed[par] : 0);
    changed[row] = ch;
    if (!ch) continue;
    if (par >= 0) {
      mat4_mul(world + (int64_t)par * 16, local + (int64_t)row * 16, world + (int64_t)row * 16);
    } else {
      std::memcpy(world + (int64_t)row * 16, local + (int64_t)row * 16, 16 * sizeof(float));
    }
    normal_mat3(world + (int64_t)row * 16, normal + (int64_t)row * 9);
  }
}

// Transform AABBs by world matrices: classic center/extent method.
// rows: (n,) transform row per mesh; world: (cap,16);
// mins/maxs: (n,3) local; out_min/out_max: (n,3) world.
void transform_aabbs(const int32_t* rows, const float* world,
                     const float* mins, const float* maxs,
                     float* out_min, float* out_max, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    const float* m = world + (int64_t)rows[i] * 16;
    const float* lo = mins + i * 3;
    const float* hi = maxs + i * 3;
    float c[3] = {(lo[0] + hi[0]) * 0.5f, (lo[1] + hi[1]) * 0.5f, (lo[2] + hi[2]) * 0.5f};
    float e[3] = {(hi[0] - lo[0]) * 0.5f, (hi[1] - lo[1]) * 0.5f, (hi[2] - lo[2]) * 0.5f};
    for (int r = 0; r < 3; ++r) {
      float wc = m[r * 4 + 0] * c[0] + m[r * 4 + 1] * c[1] + m[r * 4 + 2] * c[2] + m[r * 4 + 3];
      float we = std::fabs(m[r * 4 + 0]) * e[0] + std::fabs(m[r * 4 + 1]) * e[1] +
                 std::fabs(m[r * 4 + 2]) * e[2];
      out_min[i * 3 + r] = wc - we;
      out_max[i * 3 + r] = wc + we;
    }
  }
}

// Batched linear/step keyframe sampling for vec-valued channels.
// For channel j: times[t_off[j] .. t_off[j]+t_len[j]) ascending,
// values at v_off[j] with `dim[j]` floats per key; mode 0=LINEAR 1=STEP
// 2=SLERP(quat, dim must be 4). t: (n_channels,) sample times.
// out: concatenated per-channel outputs at v_out_off[j].
void sample_channels(const float* times, const float* values,
                     const int64_t* t_off, const int32_t* t_len,
                     const int64_t* v_off, const int32_t* dim,
                     const int32_t* mode, const float* t,
                     const int64_t* out_off, float* out, int64_t n_channels) {
  for (int64_t j = 0; j < n_channels; ++j) {
    const float* tm = times + t_off[j];
    int32_t K = t_len[j];
    int32_t D = dim[j];
    const float* val = values + v_off[j];
    float* o = out + out_off[j];
    float tt = t[j];
    if (K == 0) continue;
    if (K == 1 || tt <= tm[0]) { std::memcpy(o, val, D * sizeof(float)); continue; }
    if (tt >= tm[K - 1]) { std::memcpy(o, val + (int64_t)(K - 1) * D, D * sizeof(float)); continue; }
    // binary search: largest i with tm[i] <= tt
    int32_t lo = 0, hi = K - 1;
    while (hi - lo > 1) {
      int32_t mid = (lo + hi) / 2;
      if (tm[mid] <= tt) lo = mid; else hi = mid;
    }
    float dt = tm[lo + 1] - tm[lo];
    float u = dt > 1e-9f ? (tt - tm[lo]) / dt : 0.f;
    const float* v0 = val + (int64_t)lo * D;
    const float* v1 = val + (int64_t)(lo + 1) * D;
    if (mode[j] == 1) {  // STEP
      std::memcpy(o, v0, D * sizeof(float));
    } else if (mode[j] == 2 && D == 4) {  // quat slerp
      double d = (double)v0[0] * v1[0] + (double)v0[1] * v1[1] +
                 (double)v0[2] * v1[2] + (double)v0[3] * v1[3];
      float sign = 1.f;
      if (d < 0) { d = -d; sign = -1.f; }
      float w0, w1;
      if (d > 0.9995) { w0 = 1.f - u; w1 = u; }
      else {
        double theta = std::acos(d < 1.0 ? d : 1.0);
        double s = std::sin(theta);
        w0 = (float)(std::sin((1.0 - u) * theta) / s);
        w1 = (float)(std::sin(u * theta) / s);
      }
      float q[4];
      float norm = 0.f;
      for (int c = 0; c < 4; ++c) { q[c] = w0 * v0[c] + sign * w1 * v1[c]; norm += q[c] * q[c]; }
      norm = std::sqrt(norm);
      for (int c = 0; c < 4; ++c) o[c] = norm > 1e-12f ? q[c] / norm : (c == 3 ? 1.f : 0.f);
    } else {  // LINEAR
      for (int c = 0; c < D; ++c) o[c] = (1.f - u) * v0[c] + u * v1[c];
    }
  }
}

// ---------------------------------------------------------------------------
// MikkTSpace-convention tangent generation.
//
// The reference embeds real mikktspace (bevy_mikktspace) and collapses its
// per-corner outputs to per-vertex tangents by summing + majority handedness
// vote (gltf/buffers/tangents.rs:101-347: MikkTSpaceGeometry::
// set_tangent_encoded accumulates, finalize_tangents normalizes + votes).
// This implements the mikktspace core semantics that matter for parity:
//   * corners are WELDED by exact (position, normal, uv) equality, so
//     indexed and exploded meshes produce identical tangents (mikktspace
//     GenerateSharedVerticesIndexList);
//   * per-face tangent direction from uv derivatives, with the face's uv
//     ORIENTATION (sign of the uv determinant) kept separate — groups never
//     mix orientations, so mirrored-UV seams keep per-side handedness
//     instead of cancelling (the failure mode of plain Lengyel averaging);
//   * accumulation is corner-ANGLE weighted on normalized projected
//     directions (mikktspace AccumulateTSpaces);
//   * per-corner output = group average orthogonalized against the corner
//     normal; w = group orientation sign.
// Simplification vs mikktspace.c: groups are keyed by (welded vertex,
// orientation) without the edge-adjacency connected-component walk, so
// coincident-but-disconnected charts of the same orientation share a group
// (mikktspace would split them); no subgroup compatibility pass. Both only
// differ on duplicated/overlapping geometry.
//
// pos (n_verts,3) f32, nrm (n_verts,3), uv (n_verts,2), idx (n_tris,3) i32.
// out (n_verts,4): xyz tangent + handedness w, reference-collapsed.

struct ArrHash {
  size_t operator()(const uint64_t& v) const { return std::hash<uint64_t>()(v); }
};

static inline float dot3f(const float* a, const float* b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}

static inline float norm3f(float* v) {
  float l = std::sqrt(dot3f(v, v));
  if (l > 1e-20f) { v[0] /= l; v[1] /= l; v[2] /= l; }
  return l;
}

static inline void canonical_tangent(const float* n, float* t) {
  // cross of a non-parallel axis with n (tangents.rs canonical_tangent)
  float axis[3] = {0.f, 1.f, 0.f};
  if (std::fabs(n[1]) >= 0.999f) { axis[0] = 1.f; axis[1] = 0.f; }
  t[0] = axis[1] * n[2] - axis[2] * n[1];
  t[1] = axis[2] * n[0] - axis[0] * n[2];
  t[2] = axis[0] * n[1] - axis[1] * n[0];
  if (norm3f(t) < 1e-20f) { t[0] = 1.f; t[1] = 0.f; t[2] = 0.f; }
}

void mikktspace_tangents(const float* pos, const float* nrm, const float* uv,
                         const int32_t* idx, int64_t n_tris, int64_t n_verts,
                         float* out) {
  // --- weld corners by exact (pos, nrm, uv) bits --------------------------
  std::vector<int32_t> weld(n_verts);
  {
    std::unordered_map<uint64_t, std::vector<int32_t>> buckets;
    buckets.reserve((size_t)n_verts);
    int32_t next = 0;
    for (int64_t v = 0; v < n_verts; ++v) {
      uint32_t bits[8];
      std::memcpy(bits + 0, pos + v * 3, 12);
      std::memcpy(bits + 3, nrm + v * 3, 12);
      std::memcpy(bits + 6, uv + v * 2, 8);
      uint64_t h = 1469598103934665603ull;   // FNV-1a over the 32 bytes
      for (int k = 0; k < 8; ++k) { h ^= bits[k]; h *= 1099511628211ull; }
      auto& bucket = buckets[h];
      int32_t found = -1;
      for (int32_t cand : bucket) {
        if (std::memcmp(pos + (int64_t)cand * 3, pos + v * 3, 12) == 0 &&
            std::memcmp(nrm + (int64_t)cand * 3, nrm + v * 3, 12) == 0 &&
            std::memcmp(uv + (int64_t)cand * 2, uv + v * 2, 8) == 0) {
          found = weld[cand];
          break;
        }
      }
      if (found < 0) { found = next++; bucket.push_back((int32_t)v); }
      weld[v] = found;
    }
  }

  // --- per-(welded vertex, orientation) accumulation groups ----------------
  std::unordered_map<uint64_t, int32_t, ArrHash> group_of;
  std::vector<float> gsum;                       // 3 floats per group
  std::vector<int32_t> corner_group(n_tris * 3, -1);
  std::vector<float> corner_sign(n_tris * 3, 1.f);

  for (int64_t f = 0; f < n_tris; ++f) {
    const int32_t vi[3] = {idx[f * 3], idx[f * 3 + 1], idx[f * 3 + 2]};
    const float* p0 = pos + (int64_t)vi[0] * 3;
    const float* p1 = pos + (int64_t)vi[1] * 3;
    const float* p2 = pos + (int64_t)vi[2] * 3;
    const float* u0 = uv + (int64_t)vi[0] * 2;
    const float* u1 = uv + (int64_t)vi[1] * 2;
    const float* u2 = uv + (int64_t)vi[2] * 2;
    float e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    float e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
    float d1[2] = {u1[0] - u0[0], u1[1] - u0[1]};
    float d2[2] = {u2[0] - u0[0], u2[1] - u0[1]};
    float det = d1[0] * d2[1] - d2[0] * d1[1];
    float s = det >= 0.f ? 1.f : -1.f;
    bool degenerate = std::fabs(det) < 1e-12f;
    float inv = degenerate ? 0.f : 1.f / det;
    float tf[3] = {(e1[0] * d2[1] - e2[0] * d1[1]) * inv,
                   (e1[1] * d2[1] - e2[1] * d1[1]) * inv,
                   (e1[2] * d2[1] - e2[2] * d1[1]) * inv};
    const float* pc[3] = {p0, p1, p2};
    for (int c = 0; c < 3; ++c) {
      int64_t corner = f * 3 + c;
      corner_sign[corner] = s;
      if (degenerate) continue;
      uint64_t key = ((uint64_t)(uint32_t)weld[vi[c]] << 1) | (s > 0.f ? 1u : 0u);
      auto it = group_of.find(key);
      int32_t g;
      if (it == group_of.end()) {
        g = (int32_t)(gsum.size() / 3);
        group_of.emplace(key, g);
        gsum.insert(gsum.end(), {0.f, 0.f, 0.f});
      } else {
        g = it->second;
      }
      corner_group[corner] = g;
      // corner angle weight (mikktspace AccumulateTSpaces)
      const float* pa = pc[(c + 1) % 3];
      const float* pb = pc[(c + 2) % 3];
      float a[3] = {pa[0] - pc[c][0], pa[1] - pc[c][1], pa[2] - pc[c][2]};
      float b[3] = {pb[0] - pc[c][0], pb[1] - pc[c][1], pb[2] - pc[c][2]};
      if (norm3f(a) < 1e-20f || norm3f(b) < 1e-20f) continue;
      float cosw = dot3f(a, b);
      cosw = cosw > 1.f ? 1.f : (cosw < -1.f ? -1.f : cosw);
      float w = std::acos(cosw);
      // project the face tangent onto the corner normal's plane, then
      // accumulate the normalized direction weighted by the corner angle
      const float* n = nrm + (int64_t)vi[c] * 3;
      float proj[3] = {tf[0] - n[0] * dot3f(n, tf),
                       tf[1] - n[1] * dot3f(n, tf),
                       tf[2] - n[2] * dot3f(n, tf)};
      if (norm3f(proj) < 1e-20f) continue;
      gsum[(size_t)g * 3 + 0] += proj[0] * w;
      gsum[(size_t)g * 3 + 1] += proj[1] * w;
      gsum[(size_t)g * 3 + 2] += proj[2] * w;
    }
  }

  // --- per-corner tspace → reference-style per-vertex collapse -------------
  std::vector<double> vsum(n_verts * 3, 0.0);
  std::vector<float> sign_sum(n_verts, 0.f);
  std::vector<uint32_t> pos_cnt(n_verts, 0), neg_cnt(n_verts, 0), cnt(n_verts, 0);
  for (int64_t corner = 0; corner < n_tris * 3; ++corner) {
    int32_t g = corner_group[corner];
    int32_t v = idx[corner];
    const float* n = nrm + (int64_t)v * 3;
    float t[3];
    if (g >= 0) {
      t[0] = gsum[(size_t)g * 3 + 0];
      t[1] = gsum[(size_t)g * 3 + 1];
      t[2] = gsum[(size_t)g * 3 + 2];
      float proj = dot3f(n, t);
      t[0] -= n[0] * proj; t[1] -= n[1] * proj; t[2] -= n[2] * proj;
      if (norm3f(t) < 1e-20f) canonical_tangent(n, t);
    } else {
      canonical_tangent(n, t);
    }
    float s = corner_sign[corner];
    vsum[(size_t)v * 3 + 0] += t[0];
    vsum[(size_t)v * 3 + 1] += t[1];
    vsum[(size_t)v * 3 + 2] += t[2];
    sign_sum[v] += s;
    if (s > 0.f) pos_cnt[v]++; else neg_cnt[v]++;
    cnt[v]++;
  }
  for (int64_t v = 0; v < n_verts; ++v) {
    float* o = out + v * 4;
    if (cnt[v] == 0) { o[0] = 1.f; o[1] = 0.f; o[2] = 0.f; o[3] = 1.f; continue; }
    const float* n = nrm + v * 3;
    float t[3] = {(float)vsum[(size_t)v * 3], (float)vsum[(size_t)v * 3 + 1],
                  (float)vsum[(size_t)v * 3 + 2]};
    float proj = dot3f(n, t);
    t[0] -= n[0] * proj; t[1] -= n[1] * proj; t[2] -= n[2] * proj;
    if (norm3f(t) < 1e-20f || !std::isfinite(t[0] + t[1] + t[2]))
      canonical_tangent(n, t);
    // sign: sign_sum when stable, else majority vote (finalize_tangents)
    float ss = sign_sum[v];
    float sign;
    if (!std::isfinite(ss)) sign = 1.f;
    else if (std::fabs(ss) >= 1e-4f) sign = ss > 0.f ? 1.f : -1.f;
    else sign = pos_cnt[v] >= neg_cnt[v] ? 1.f : -1.f;
    o[0] = t[0]; o[1] = t[1]; o[2] = t[2]; o[3] = sign;
  }
}

// ---- texture mip-chain generation + texel-row packing ---------------------
//
// The reference generates mips on the GPU (renderer-core texture/mipmap.rs
// compute shader) and uploads plain RGBA layers. The TPU texel pool instead
// bakes each texel's full trilinear footprint into ONE 128-B bf16 row
// (core/textures.py header: bilinear quad + parent-mip 3x3). Packing those
// rows in numpy measured ~60 s for five 1024x1024 maps (DamagedHelmet
// class) — ml_dtypes bf16 casts and 13-way concatenates over ~900 MB of
// intermediates. This native path runs the whole chain in one pass:
// semantic-filtered downsample (normal renormalize / perceptual r^2
// roughness, mipmap.rs:26-62 semantics), quad + parent packing, and
// float->bf16 round-to-nearest-even, writing the destination rows directly.

static inline uint16_t f2bf(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t lsb = (x >> 16) & 1u;
  x += 0x7fffu + lsb;  // round to nearest even (numpy astype semantics)
  return (uint16_t)(x >> 16);
}

static inline int64_t wrap_i(int64_t i, int64_t n, int32_t mode) {
  // REPEAT=0 -> modular; CLAMP/MIRROR -> edge clamp (mirrored sampling
  // folds the coordinate before lookup, after which neighbors clamp)
  if (mode == 0) {
    i %= n;
    return i < 0 ? i + n : i;
  }
  return i < 0 ? 0 : (i >= n ? n - 1 : i);
}

// uint8 (h, w, c) image -> (h, w, 4) f32, optionally sRGB->linear on RGB.
// The add_image conversion chain (astype/255 + alpha concat + srgb pow)
// cost ~0.25 s per 1024x1024 in numpy; u8 inputs take an exact 256-entry
// LUT (the EOTF of every possible byte, same formula as
// core/textures.py srgb_to_linear).
void u8_to_f32_rgba(const uint8_t* img, int64_t h, int64_t w, int32_t c,
                    int32_t srgb, float* out) {
  float lut_lin[256], lut_srgb[256];
  for (int i = 0; i < 256; ++i) {
    float v = (float)i / 255.0f;
    lut_lin[i] = v;
    lut_srgb[i] = v <= 0.04045f ? v / 12.92f
                                : std::pow((v + 0.055f) / 1.055f, 2.4f);
  }
  const float* lut = srgb ? lut_srgb : lut_lin;
  int64_t n = h * w;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = img + i * c;
    float* o = out + i * 4;
    if (c == 1) {
      float v = lut[p[0]];
      o[0] = v; o[1] = v; o[2] = v; o[3] = 1.0f;
    } else {
      o[0] = lut[p[0]];
      o[1] = lut[p[1]];
      o[2] = lut[p[2]];
      o[3] = c >= 4 ? (float)p[3] / 255.0f : 1.0f;  // alpha stays linear
    }
  }
}

// img: (h0, w0, 4) f32, linear; out: sum(h_i*w_i) rows x 64 u16 (bf16).
// kind: 0=color/scalar box, 1=normal (renormalize), 2=metallic-roughness
// (G averages as r^2). n_levels must satisfy integer area ratios at every
// step (caller gates; powers of two always do).
void pack_texture_mips(const float* img, int64_t h0, int64_t w0,
                       int32_t kind, int32_t wrap_s, int32_t wrap_t,
                       int32_t n_levels, uint16_t* out) {
  // build the chain (f32 scratch)
  std::vector<std::vector<float>> chain(n_levels);
  std::vector<int64_t> hs(n_levels), ws(n_levels);
  hs[0] = h0; ws[0] = w0;
  chain[0].assign(img, img + (size_t)h0 * w0 * 4);
  for (int32_t L = 1; L < n_levels; ++L) {
    int64_t pw = ws[L - 1], ph = hs[L - 1];
    int64_t nw = pw / 2 > 0 ? pw / 2 : 1, nh = ph / 2 > 0 ? ph / 2 : 1;
    int64_t rx = pw / nw, ry = ph / nh;  // integer by caller gate
    ws[L] = nw; hs[L] = nh;
    chain[L].resize((size_t)nh * nw * 4);
    const std::vector<float>& src = chain[L - 1];
    std::vector<float>& dst = chain[L];
    float inv = 1.0f / (float)(rx * ry);
    for (int64_t y = 0; y < nh; ++y) {
      for (int64_t x = 0; x < nw; ++x) {
        double acc[4] = {0, 0, 0, 0};
        for (int64_t sy = 0; sy < ry; ++sy) {
          const float* row = src.data() + (((size_t)(y * ry + sy)) * pw
                                           + (size_t)x * rx) * 4;
          for (int64_t sx = 0; sx < rx; ++sx) {
            const float* p = row + (size_t)sx * 4;
            if (kind == 1) {
              acc[0] += p[0] * 2.0f - 1.0f;
              acc[1] += p[1] * 2.0f - 1.0f;
              acc[2] += p[2] * 2.0f - 1.0f;
              acc[3] += p[3];
            } else if (kind == 2) {
              acc[0] += p[0];
              acc[1] += (double)p[1] * p[1];  // perceptual roughness
              acc[2] += p[2];
              acc[3] += p[3];
            } else {
              acc[0] += p[0]; acc[1] += p[1]; acc[2] += p[2]; acc[3] += p[3];
            }
          }
        }
        float* o = dst.data() + ((size_t)y * nw + x) * 4;
        if (kind == 1) {
          float nx = (float)(acc[0] * inv), ny = (float)(acc[1] * inv),
                nz = (float)(acc[2] * inv);
          float nn = std::sqrt(nx * nx + ny * ny + nz * nz);
          if (nn > 1e-6f) { nx /= nn; ny /= nn; nz /= nn; }
          else { nx = 0.f; ny = 0.f; nz = 1.f; }
          o[0] = (nx + 1.0f) * 0.5f;
          o[1] = (ny + 1.0f) * 0.5f;
          o[2] = (nz + 1.0f) * 0.5f;
          o[3] = (float)(acc[3] * inv);
        } else if (kind == 2) {
          o[0] = (float)(acc[0] * inv);
          float g2 = (float)(acc[1] * inv);
          o[1] = std::sqrt(g2 > 0.f ? g2 : 0.f);
          o[2] = (float)(acc[2] * inv);
          o[3] = (float)(acc[3] * inv);
        } else {
          o[0] = (float)(acc[0] * inv); o[1] = (float)(acc[1] * inv);
          o[2] = (float)(acc[2] * inv); o[3] = (float)(acc[3] * inv);
        }
      }
    }
  }

  // pack rows: quad (cols 0..15), parent 3x3 (16..51), zero pad (52..63)
  uint16_t* orow = out;
  static const float kZero4[4] = {0.f, 0.f, 0.f, 0.f};
  for (int32_t L = 0; L < n_levels; ++L) {
    const float* mip = chain[L].data();
    int64_t h = hs[L], w = ws[L];
    bool has_parent = L + 1 < n_levels;
    const float* par = has_parent ? chain[L + 1].data() : kZero4;
    int64_t h1 = has_parent ? hs[L + 1] : 1, w1 = has_parent ? ws[L + 1] : 1;
    for (int64_t y = 0; y < h; ++y) {
      int64_t yn = wrap_i(y + 1, h, wrap_t);
      int64_t by = (y - 1) >> 1;
      for (int64_t x = 0; x < w; ++x, orow += 64) {
        int64_t xn = wrap_i(x + 1, w, wrap_s);
        const float* t00 = mip + ((size_t)y * w + x) * 4;
        const float* t01 = mip + ((size_t)y * w + xn) * 4;
        const float* t10 = mip + ((size_t)yn * w + x) * 4;
        const float* t11 = mip + ((size_t)yn * w + xn) * 4;
        for (int c = 0; c < 4; ++c) orow[c] = f2bf(t00[c]);
        for (int c = 0; c < 4; ++c) orow[4 + c] = f2bf(t01[c]);
        for (int c = 0; c < 4; ++c) orow[8 + c] = f2bf(t10[c]);
        for (int c = 0; c < 4; ++c) orow[12 + c] = f2bf(t11[c]);
        int64_t bx = (x - 1) >> 1;
        int col = 16;
        for (int dy = 0; dy < 3; ++dy) {
          int64_t py = wrap_i(by + dy, h1, wrap_t);
          for (int dx = 0; dx < 3; ++dx) {
            int64_t px = wrap_i(bx + dx, w1, wrap_s);
            const float* p = par + ((size_t)py * w1 + px) * 4;
            for (int c = 0; c < 4; ++c) orow[col + c] = f2bf(p[c]);
            col += 4;
          }
        }
        for (int c = 52; c < 64; ++c) orow[c] = 0;
      }
    }
  }
}

}  // extern "C"
