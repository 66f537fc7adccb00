// Mean-field DenseCRF inference (Krähenbühl & Koltun 2011) over the
// permutohedral lattice — native replacement for the reference's pydensecrf
// dependency (call site: evals/models/crf.py:19-49; constants :11-16).
//
// Exposed as a C ABI for ctypes (midvision_probe_tpu/models/crf.py).

#include <algorithm>
#include <cmath>
#include <vector>

#include "permutohedral.h"

namespace {

using mvp::Permutohedral;

struct Kernel {
  Permutohedral lattice;
  std::vector<float> norm;  // symmetric normalization 1/sqrt(lattice(1))
  float weight;

  void init(const float* features, int d, int N, float w) {
    weight = w;
    lattice.init(features, d, N);
    std::vector<float> ones(N, 1.f);
    norm.assign(N, 0.f);
    lattice.compute(norm.data(), ones.data(), 1);
    for (int i = 0; i < N; ++i)
      norm[i] = 1.f / std::sqrt(std::max(norm[i], 1e-20f));
  }

  // out += weight * norm * lattice(norm * Q), channel-major (N x C).
  void apply(float* out, const float* Q, int N, int C,
             std::vector<float>& tmp_in, std::vector<float>& tmp_out) const {
    for (int i = 0; i < N; ++i)
      for (int c = 0; c < C; ++c)
        tmp_in[static_cast<size_t>(i) * C + c] =
            Q[static_cast<size_t>(i) * C + c] * norm[i];
    lattice.compute(tmp_out.data(), tmp_in.data(), C);
    for (int i = 0; i < N; ++i)
      for (int c = 0; c < C; ++c)
        out[static_cast<size_t>(i) * C + c] +=
            weight * norm[i] * tmp_out[static_cast<size_t>(i) * C + c];
  }
};

}  // namespace

extern "C" {

// Raw lattice filter for testing/reuse: features (N x d, point-major),
// values (N x vs, point-major) -> out (N x vs). Returns 0 on success.
int permutohedral_filter(const float* features, int d, int N,
                         const float* values, int vs, float* out) {
  if (N <= 0 || d <= 0 || vs <= 0) return 1;
  Permutohedral lattice;
  lattice.init(features, d, N);
  lattice.compute(out, values, vs);
  return 0;
}

// image: H*W*3 uint8 (row-major RGB); unary_probs: C*H*W float (softmax
// probabilities, channel-major like the python caller); out: C*H*W float
// (final marginals Q). Returns 0 on success.
int dense_crf_inference(const unsigned char* image, const float* unary_probs,
                        int H, int W, int C, int iters, float pos_w,
                        float pos_xy_std, float bi_w, float bi_xy_std,
                        float bi_rgb_std, float* out) {
  const int N = H * W;
  if (N <= 0 || C <= 0) return 1;

  // unary energies, point-major (N x C)
  std::vector<float> unary(static_cast<size_t>(N) * C);
  for (int c = 0; c < C; ++c)
    for (int i = 0; i < N; ++i)
      unary[static_cast<size_t>(i) * C + c] = -std::log(
          std::max(unary_probs[static_cast<size_t>(c) * N + i], 1e-8f));

  // kernels
  std::vector<float> feat_gauss(static_cast<size_t>(N) * 2);
  std::vector<float> feat_bi(static_cast<size_t>(N) * 5);
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      int i = y * W + x;
      feat_gauss[static_cast<size_t>(i) * 2 + 0] = x / pos_xy_std;
      feat_gauss[static_cast<size_t>(i) * 2 + 1] = y / pos_xy_std;
      feat_bi[static_cast<size_t>(i) * 5 + 0] = x / bi_xy_std;
      feat_bi[static_cast<size_t>(i) * 5 + 1] = y / bi_xy_std;
      feat_bi[static_cast<size_t>(i) * 5 + 2] =
          image[static_cast<size_t>(i) * 3 + 0] / bi_rgb_std;
      feat_bi[static_cast<size_t>(i) * 5 + 3] =
          image[static_cast<size_t>(i) * 3 + 1] / bi_rgb_std;
      feat_bi[static_cast<size_t>(i) * 5 + 4] =
          image[static_cast<size_t>(i) * 3 + 2] / bi_rgb_std;
    }
  }

  Kernel gauss, bilateral;
  gauss.init(feat_gauss.data(), 2, N, pos_w);
  bilateral.init(feat_bi.data(), 5, N, bi_w);

  // init Q from unary softmax (probs are already softmaxed)
  std::vector<float> Q(static_cast<size_t>(N) * C);
  for (int c = 0; c < C; ++c)
    for (int i = 0; i < N; ++i)
      Q[static_cast<size_t>(i) * C + c] =
          unary_probs[static_cast<size_t>(c) * N + i];

  std::vector<float> energy(static_cast<size_t>(N) * C);
  std::vector<float> tmp_in(static_cast<size_t>(N) * C);
  std::vector<float> tmp_out(static_cast<size_t>(N) * C);

  for (int it = 0; it < iters; ++it) {
    // energy = -unary + sum_m w_m * filtered_m(Q)   (Potts compatibility)
    for (size_t i = 0; i < energy.size(); ++i) energy[i] = -unary[i];
    gauss.apply(energy.data(), Q.data(), N, C, tmp_in, tmp_out);
    bilateral.apply(energy.data(), Q.data(), N, C, tmp_in, tmp_out);

    // Q = softmax(energy) per point
    for (int i = 0; i < N; ++i) {
      float mx = energy[static_cast<size_t>(i) * C];
      for (int c = 1; c < C; ++c)
        mx = std::max(mx, energy[static_cast<size_t>(i) * C + c]);
      float sum = 0.f;
      for (int c = 0; c < C; ++c) {
        float e = std::exp(energy[static_cast<size_t>(i) * C + c] - mx);
        Q[static_cast<size_t>(i) * C + c] = e;
        sum += e;
      }
      for (int c = 0; c < C; ++c) Q[static_cast<size_t>(i) * C + c] /= sum;
    }
  }

  for (int c = 0; c < C; ++c)
    for (int i = 0; i < N; ++i)
      out[static_cast<size_t>(c) * N + i] = Q[static_cast<size_t>(i) * C + c];
  return 0;
}

}  // extern "C"
