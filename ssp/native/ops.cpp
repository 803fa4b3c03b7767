// Native host-side ops for ssp.
//
// The reference's host hot paths run through Python/numpy (greedy NMS,
// utils/utils.py:653-712) or per-call OpenCV.  These C++ kernels serve
// the host-side duties — the exact-greedy NMS used by the evaluation
// protocol and CPU-side warping for dataset tooling — at native speed.
// The TPU compute path (XLA/Pallas) never calls these.
//
// Built with: g++ -O3 -march=native -shared -fPIC ops.cpp -o libssp_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Exact greedy grid NMS (MagicLeap semantics): visit points by
// descending score; keep a point iff no previously-kept point lies
// within chebyshev distance <= dist.  scores: [H*W] row-major.
// keep_out: [H*W] uint8 (1 = kept).  Returns number kept.
int64_t greedy_nms(const float* scores, int64_t H, int64_t W, int64_t dist,
                   float min_score, uint8_t* keep_out) {
  const int64_t n = H * W;
  std::vector<int64_t> idx;
  idx.reserve(n / 16);
  for (int64_t i = 0; i < n; ++i) {
    if (scores[i] >= min_score && scores[i] > 0.f) idx.push_back(i);
  }
  std::sort(idx.begin(), idx.end(),
            [scores](int64_t a, int64_t b) { return scores[a] > scores[b]; });

  std::memset(keep_out, 0, n);
  std::vector<uint8_t> suppressed(n, 0);
  int64_t kept = 0;
  for (int64_t i : idx) {
    if (suppressed[i]) continue;
    keep_out[i] = 1;
    ++kept;
    const int64_t y = i / W, x = i % W;
    const int64_t y0 = std::max<int64_t>(0, y - dist);
    const int64_t y1 = std::min<int64_t>(H - 1, y + dist);
    const int64_t x0 = std::max<int64_t>(0, x - dist);
    const int64_t x1 = std::min<int64_t>(W - 1, x + dist);
    for (int64_t yy = y0; yy <= y1; ++yy) {
      std::memset(&suppressed[yy * W + x0], 1, x1 - x0 + 1);
    }
  }
  return kept;
}

// Bilinear inverse warp with zero padding, normalized [-1, 1]
// align-corners coordinates (same contract as ssp.core.warp).
// img: [H*W], Hm: 3x3 row-major output->input map, out: [H*W].
void inv_warp_bilinear(const float* img, int64_t H, int64_t W,
                       const double* Hm, float* out) {
  const double sx = (W - 1) / 2.0, sy = (H - 1) / 2.0;
  for (int64_t py = 0; py < H; ++py) {
    const double ny = py / sy - 1.0;
    for (int64_t px = 0; px < W; ++px) {
      const double nx = px / sx - 1.0;
      const double w = Hm[6] * nx + Hm[7] * ny + Hm[8];
      const double u = (Hm[0] * nx + Hm[1] * ny + Hm[2]) / w;
      const double v = (Hm[3] * nx + Hm[4] * ny + Hm[5]) / w;
      const double fx = (u + 1.0) * sx;
      const double fy = (v + 1.0) * sy;
      const int64_t x0 = static_cast<int64_t>(std::floor(fx));
      const int64_t y0 = static_cast<int64_t>(std::floor(fy));
      const double wx = fx - x0, wy = fy - y0;
      double acc = 0.0;
      for (int dy = 0; dy <= 1; ++dy) {
        for (int dx = 0; dx <= 1; ++dx) {
          const int64_t xx = x0 + dx, yy = y0 + dy;
          if (xx < 0 || xx >= W || yy < 0 || yy >= H) continue;
          const double wgt = (dx ? wx : 1.0 - wx) * (dy ? wy : 1.0 - wy);
          acc += wgt * img[yy * W + xx];
        }
      }
      out[py * W + px] = static_cast<float>(acc);
    }
  }
}

// Two-way nearest-neighbour matching on unit-norm descriptors.
// d1: [n1*D], d2: [n2*D]; out_idx: [n1], out_dist: [n1]; a match i is
// valid iff out_mutual[i] == 1 and out_dist[i] < nn_thresh.
void nn_match_two_way(const float* d1, int64_t n1, const float* d2,
                      int64_t n2, int64_t D, int32_t* out_idx,
                      float* out_dist, uint8_t* out_mutual) {
  std::vector<int32_t> best2(n2, -1);
  std::vector<float> best2_sim(n2, -2.f);
  std::vector<float> best1_sim(n1, -2.f);
  for (int64_t i = 0; i < n1; ++i) {
    const float* a = d1 + i * D;
    int32_t arg = -1;
    float best = -2.f;
    for (int64_t j = 0; j < n2; ++j) {
      const float* b = d2 + j * D;
      float s = 0.f;
      for (int64_t k = 0; k < D; ++k) s += a[k] * b[k];
      if (s > best) { best = s; arg = static_cast<int32_t>(j); }
      if (s > best2_sim[j]) { best2_sim[j] = s; best2[j] = static_cast<int32_t>(i); }
    }
    out_idx[i] = arg;
    best1_sim[i] = best;
  }
  for (int64_t i = 0; i < n1; ++i) {
    const float sim = std::min(std::max(best1_sim[i], -1.f), 1.f);
    out_dist[i] = std::sqrt(std::max(2.f - 2.f * sim, 0.f));
    out_mutual[i] = (out_idx[i] >= 0 && best2[out_idx[i]] == i) ? 1 : 0;
  }
}

}  // extern "C"
