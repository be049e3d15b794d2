// acr_native: host-side native runtime components.
//
// Fills the role of the reference's native dependencies (SURVEY.md §2.7):
//  * metric-translation recovery — the reference calls OpenCV's C++
//    solvePnPRansac (EPnP, reprojection threshold 20px, 100 iters) with a
//    numpy weighted-least-squares fallback (reference: acr/utils.py:414-519).
//    Here: the closed-form WLS solve plus a RANSAC wrapper over it, so the
//    host path has the same robustness contract without OpenCV.
//  * offscreen mesh rasterization — the reference uses pyrender/OpenGL or
//    pytorch3d/CUDA (acr/renderer/*). Here: a z-buffer rasterizer with
//    smooth (barycentric vertex-normal) Lambert shading matching the
//    camera/lighting reduction documented in acr_tpu/viz/raster.py.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces native/build/libacr_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

// Solve the 3x3 normal equations A t = b via Cramer's rule.
// Returns false on a singular system.
bool solve3x3(const double A[9], const double b[3], double t[3]) {
  const double det =
      A[0] * (A[4] * A[8] - A[5] * A[7]) -
      A[1] * (A[3] * A[8] - A[5] * A[6]) +
      A[2] * (A[3] * A[7] - A[4] * A[6]);
  if (std::fabs(det) < 1e-12) return false;
  const double inv = 1.0 / det;
  double C[9];  // adjugate
  C[0] = (A[4] * A[8] - A[5] * A[7]);
  C[1] = -(A[1] * A[8] - A[2] * A[7]);
  C[2] = (A[1] * A[5] - A[2] * A[4]);
  C[3] = -(A[3] * A[8] - A[5] * A[6]);
  C[4] = (A[0] * A[8] - A[2] * A[6]);
  C[5] = -(A[0] * A[5] - A[2] * A[3]);
  C[6] = (A[3] * A[7] - A[4] * A[6]);
  C[7] = -(A[0] * A[7] - A[1] * A[6]);
  C[8] = (A[0] * A[4] - A[1] * A[3]);
  for (int i = 0; i < 3; ++i)
    t[i] = inv * (C[3 * i + 0] * b[0] + C[3 * i + 1] * b[1] +
                  C[3 * i + 2] * b[2]);
  return true;
}

// Weighted least squares over a subset of joints. mask==nullptr => all.
bool wls_translation(const float* j3d, const float* uv, int n,
                     const uint8_t* mask, float focal, float cx, float cy,
                     double t[3]) {
  double A[9] = {0}, b[3] = {0};
  const double f = focal;
  for (int i = 0; i < n; ++i) {
    if (mask && !mask[i]) continue;
    const double X = j3d[3 * i], Y = j3d[3 * i + 1], Z = j3d[3 * i + 2];
    const double u = uv[2 * i], v = uv[2 * i + 1];
    // rows: [f, 0, cx-u] . t = (u-cx) Z - f X ;  [0, f, cy-v] . t = ...
    const double r1[3] = {f, 0.0, cx - u};
    const double c1 = (u - cx) * Z - f * X;
    const double r2[3] = {0.0, f, cy - v};
    const double c2 = (v - cy) * Z - f * Y;
    for (int a = 0; a < 3; ++a) {
      for (int c = 0; c < 3; ++c) A[3 * a + c] += r1[a] * r1[c] + r2[a] * r2[c];
      b[a] += r1[a] * c1 + r2[a] * c2;
    }
  }
  return solve3x3(A, b, t);
}

double reproj_err(const float* j3d, const float* uv, int i, const double t[3],
                  float focal, float cx, float cy) {
  const double X = j3d[3 * i] + t[0], Y = j3d[3 * i + 1] + t[1],
               Z = j3d[3 * i + 2] + t[2];
  if (Z <= 1e-6) return 1e9;
  const double du = focal * X / Z + cx - uv[2 * i];
  const double dv = focal * Y / Z + cy - uv[2 * i + 1];
  return std::sqrt(du * du + dv * dv);
}

}  // namespace

extern "C" {

// Closed-form weighted-LS metric translation. Returns 0 on success.
int acr_estimate_translation(const float* j3d, const float* uv, int n,
                             float focal, float cx, float cy, float* out_t) {
  double t[3];
  if (!wls_translation(j3d, uv, n, nullptr, focal, cx, cy, t)) return 1;
  for (int i = 0; i < 3; ++i) out_t[i] = static_cast<float>(t[i]);
  return 0;
}

// RANSAC over minimal 4-point LS subsets (the robustness contract of the
// reference's solvePnPRansac call: reprojectionError=20, iterations=100),
// refined on the inlier consensus. Returns 0 on success.
int acr_estimate_translation_ransac(const float* j3d, const float* uv, int n,
                                    float focal, float cx, float cy,
                                    int iterations, float reproj_thresh,
                                    unsigned seed, float* out_t) {
  if (n < 4) return acr_estimate_translation(j3d, uv, n, focal, cx, cy, out_t);
  std::mt19937 rng(seed);
  std::uniform_int_distribution<int> pick(0, n - 1);
  std::vector<uint8_t> mask(n), best_mask(n, 1);
  int best_inliers = -1;
  for (int it = 0; it < iterations; ++it) {
    std::fill(mask.begin(), mask.end(), 0);
    for (int k = 0; k < 4;) {
      int idx = pick(rng);
      if (!mask[idx]) { mask[idx] = 1; ++k; }
    }
    double t[3];
    if (!wls_translation(j3d, uv, n, mask.data(), focal, cx, cy, t)) continue;
    int inliers = 0;
    for (int i = 0; i < n; ++i)
      if (reproj_err(j3d, uv, i, t, focal, cx, cy) < reproj_thresh) ++inliers;
    if (inliers > best_inliers) {
      best_inliers = inliers;
      for (int i = 0; i < n; ++i)
        best_mask[i] = reproj_err(j3d, uv, i, t, focal, cx, cy) < reproj_thresh;
    }
  }
  double t[3];
  const uint8_t* m = best_inliers >= 4 ? best_mask.data() : nullptr;
  if (!wls_translation(j3d, uv, n, m, focal, cx, cy, t)) return 1;
  for (int i = 0; i < 3; ++i) out_t[i] = static_cast<float>(t[i]);
  return 0;
}

// Z-buffer rasterizer with smooth Lambert shading.
//   verts: (V, 3) camera-space positions (pinhole u=f x/z+cx, v=f y/z+cy)
//   faces: (F, 3) vertex indices (degenerate faces skipped)
//   face_colors: (F, 3) RGB in [0, 1]
//   out_rgba: (H, W, 4) float, premultiplied alpha = coverage
void acr_rasterize(const float* verts, int V, const int32_t* faces, int F,
                   const float* face_colors, int H, int W, float focal,
                   float cx, float cy, float ambient, float directional,
                   float* out_rgba) {
  std::vector<float> screen(3 * V);
  for (int i = 0; i < V; ++i) {
    const float z = std::max(verts[3 * i + 2], 1e-4f);
    screen[3 * i] = focal * verts[3 * i] / z + cx;
    screen[3 * i + 1] = focal * verts[3 * i + 1] / z + cy;
    screen[3 * i + 2] = z;
  }
  // area-weighted vertex normals
  std::vector<float> vnorm(3 * V, 0.f);
  for (int f = 0; f < F; ++f) {
    const int a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
    float e1[3], e2[3], nx, ny, nz;
    for (int k = 0; k < 3; ++k) {
      e1[k] = verts[3 * b + k] - verts[3 * a + k];
      e2[k] = verts[3 * c + k] - verts[3 * a + k];
    }
    nx = e1[1] * e2[2] - e1[2] * e2[1];
    ny = e1[2] * e2[0] - e1[0] * e2[2];
    nz = e1[0] * e2[1] - e1[1] * e2[0];
    for (int vtx : {a, b, c}) {
      vnorm[3 * vtx] += nx;
      vnorm[3 * vtx + 1] += ny;
      vnorm[3 * vtx + 2] += nz;
    }
  }
  for (int i = 0; i < V; ++i) {
    const float nlen = std::sqrt(vnorm[3 * i] * vnorm[3 * i] +
                                 vnorm[3 * i + 1] * vnorm[3 * i + 1] +
                                 vnorm[3 * i + 2] * vnorm[3 * i + 2]);
    if (nlen > 1e-12f)
      for (int k = 0; k < 3; ++k) vnorm[3 * i + k] /= nlen;
  }

  std::vector<float> zbuf(static_cast<size_t>(H) * W, 1e30f);
  std::memset(out_rgba, 0, sizeof(float) * 4 * H * W);

  for (int f = 0; f < F; ++f) {
    const int ia = faces[3 * f], ib = faces[3 * f + 1], ic = faces[3 * f + 2];
    const float ax = screen[3 * ia], ay = screen[3 * ia + 1], az = screen[3 * ia + 2];
    const float bx = screen[3 * ib], by = screen[3 * ib + 1], bz = screen[3 * ib + 2];
    const float cx2 = screen[3 * ic], cy2 = screen[3 * ic + 1], cz = screen[3 * ic + 2];
    const float area = (bx - ax) * (cy2 - ay) - (cx2 - ax) * (by - ay);
    if (std::fabs(area) < 1e-9f) continue;
    const float inv_area = 1.f / area;
    const int x0 = std::max(0, (int)std::floor(std::min({ax, bx, cx2})));
    const int x1 = std::min(W - 1, (int)std::ceil(std::max({ax, bx, cx2})));
    const int y0 = std::max(0, (int)std::floor(std::min({ay, by, cy2})));
    const int y1 = std::min(H - 1, (int)std::ceil(std::max({ay, by, cy2})));
    for (int y = y0; y <= y1; ++y) {
      const float py = y + 0.5f;
      for (int x = x0; x <= x1; ++x) {
        const float px = x + 0.5f;
        const float w0 = ((cx2 - bx) * (py - by) - (cy2 - by) * (px - bx)) * inv_area;
        const float w1 = ((ax - cx2) * (py - cy2) - (ay - cy2) * (px - cx2)) * inv_area;
        const float w2 = 1.f - w0 - w1;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        const float depth = w0 * az + w1 * bz + w2 * cz;
        const size_t pix = static_cast<size_t>(y) * W + x;
        if (depth >= zbuf[pix]) continue;
        zbuf[pix] = depth;
        float n[3];
        for (int k = 0; k < 3; ++k)
          n[k] = w0 * vnorm[3 * ia + k] + w1 * vnorm[3 * ib + k] +
                 w2 * vnorm[3 * ic + k];
        const float nlen = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
        const float nz = nlen > 1e-12f ? n[2] / nlen : 0.f;
        const float lambert = std::max(0.f, -nz);
        const float inten = std::min(1.f, ambient + directional * lambert);
        for (int k = 0; k < 3; ++k)
          out_rgba[4 * pix + k] = face_colors[3 * f + k] * inten;
        out_rgba[4 * pix + 3] = 1.f;
      }
    }
  }
}

}  // extern "C"
