#include "permutohedral.h"

#include <cmath>

namespace mvp {

void Permutohedral::init(const float* features, int d, int N) {
  N_ = N;
  d_ = d;
  offset_.assign(static_cast<size_t>(N) * (d + 1), 0);
  barycentric_.assign(static_cast<size_t>(N) * (d + 1), 0.f);

  // Scaling factors canonical to the lattice (Adams et al. §3).
  std::vector<float> scale_factor(d);
  const float inv_std_dev = std::sqrt(2.f / 3.f) * (d + 1);
  for (int i = 0; i < d; ++i)
    scale_factor[i] =
        inv_std_dev / std::sqrt(static_cast<float>((i + 2) * (i + 1)));

  std::unordered_map<std::vector<short>, int, KeyHash> hash_table;
  hash_table.reserve(static_cast<size_t>(N) * (d + 1));

  std::vector<float> elevated(d + 1);
  std::vector<int> rem0(d + 1);
  std::vector<int> rank(d + 1);
  std::vector<float> barycentric(d + 2);
  std::vector<short> key(d);

  std::vector<std::vector<short>> lattice_keys;

  for (int n = 0; n < N; ++n) {
    const float* f = features + static_cast<size_t>(n) * d;

    // Embed into the hyperplane sum(x)=0 in R^{d+1} (E * x).
    float sm = 0.f;
    for (int j = d; j > 0; --j) {
      float cf = f[j - 1] * scale_factor[j - 1];
      elevated[j] = sm - j * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // Find closest 0-colored simplex remainder point.
    const float down_factor = 1.f / (d + 1);
    const float up_factor = static_cast<float>(d + 1);
    int sum = 0;
    for (int j = 0; j <= d; ++j) {
      int rd = static_cast<int>(std::round(down_factor * elevated[j]));
      rem0[j] = rd * (d + 1);
      sum += rd;
    }

    // Rank differential coordinates.
    std::fill(rank.begin(), rank.end(), 0);
    for (int i = 0; i < d; ++i) {
      double di = elevated[i] - rem0[i];
      for (int j = i + 1; j <= d; ++j) {
        if (di < elevated[j] - rem0[j])
          ++rank[i];
        else
          ++rank[j];
      }
    }

    // Fix out-of-bounds points (sum != 0).
    for (int j = 0; j <= d; ++j) {
      rank[j] += sum;
      if (rank[j] < 0) {
        rank[j] += d + 1;
        rem0[j] += d + 1;
      } else if (rank[j] > d) {
        rank[j] -= d + 1;
        rem0[j] -= d + 1;
      }
    }

    // Barycentric coordinates.
    std::fill(barycentric.begin(), barycentric.end(), 0.f);
    for (int j = 0; j <= d; ++j) {
      float v = (elevated[j] - rem0[j]) * down_factor;
      barycentric[d - rank[j]] += v;
      barycentric[d - rank[j] + 1] -= v;
    }
    barycentric[0] += 1.f + barycentric[d + 1];

    // Register the (d+1) simplex vertices. Canonical-simplex offset
    // (Adams et al.): coordinate i of vertex `remainder` is rem0[i] +
    // remainder, wrapped down by (d+1) for the (remainder) highest-ranked
    // coordinates. A previous revision mis-factored the wrap as
    // remainder * -d, which agrees only for remainder <= 1 (so the d=1
    // Gaussian test passed) but splits the same physical vertex into
    // several hash keys for d >= 2, fragmenting splat mass and dropping
    // blur neighbours.
    for (int remainder = 0; remainder <= d; ++remainder) {
      for (int i = 0; i < d; ++i)
        key[i] = static_cast<short>(
            rem0[i] + (rank[i] <= d - remainder ? remainder
                                                : remainder - (d + 1)));
      auto it = hash_table.find(key);
      int idx;
      if (it == hash_table.end()) {
        idx = static_cast<int>(lattice_keys.size());
        hash_table.emplace(key, idx);
        lattice_keys.push_back(key);
      } else {
        idx = it->second;
      }
      offset_[static_cast<size_t>(n) * (d + 1) + remainder] = idx;
      barycentric_[static_cast<size_t>(n) * (d + 1) + remainder] =
          barycentric[remainder];
    }
  }

  M_ = static_cast<int>(lattice_keys.size());

  // Precompute blur neighbours along each lattice axis.
  blur_n1_.assign(static_cast<size_t>(M_) * (d + 1), -1);
  blur_n2_.assign(static_cast<size_t>(M_) * (d + 1), -1);
  std::vector<short> n1(d), n2(d);
  for (int j = 0; j <= d; ++j) {
    for (int i = 0; i < M_; ++i) {
      const std::vector<short>& k = lattice_keys[i];
      for (int a = 0; a < d; ++a) {
        n1[a] = static_cast<short>(k[a] - 1);
        n2[a] = static_cast<short>(k[a] + 1);
      }
      if (j < d) {
        n1[j] = static_cast<short>(k[j] + d);
        n2[j] = static_cast<short>(k[j] - d);
      }
      auto i1 = hash_table.find(n1);
      auto i2 = hash_table.find(n2);
      blur_n1_[static_cast<size_t>(j) * M_ + i] =
          i1 == hash_table.end() ? -1 : i1->second;
      blur_n2_[static_cast<size_t>(j) * M_ + i] =
          i2 == hash_table.end() ? -1 : i2->second;
    }
  }
}

void Permutohedral::compute(float* out, const float* in, int vs) const {
  const int d = d_;
  // Splat.
  std::vector<float> values(static_cast<size_t>(M_ + 2) * vs, 0.f);
  std::vector<float> new_values(static_cast<size_t>(M_ + 2) * vs, 0.f);
  for (int n = 0; n < N_; ++n) {
    for (int j = 0; j <= d; ++j) {
      int o = offset_[static_cast<size_t>(n) * (d + 1) + j] + 1;
      float w = barycentric_[static_cast<size_t>(n) * (d + 1) + j];
      for (int c = 0; c < vs; ++c)
        values[static_cast<size_t>(o) * vs + c] +=
            w * in[static_cast<size_t>(n) * vs + c];
    }
  }

  // Blur along each lattice direction.
  for (int j = 0; j <= d; ++j) {
    for (int i = 0; i < M_; ++i) {
      const float* old_val = &values[static_cast<size_t>(i + 1) * vs];
      float* new_val = &new_values[static_cast<size_t>(i + 1) * vs];
      int in1 = blur_n1_[static_cast<size_t>(j) * M_ + i];
      int in2 = blur_n2_[static_cast<size_t>(j) * M_ + i];
      const float* v1 = &values[static_cast<size_t>(in1 + 1) * vs];
      const float* v2 = &values[static_cast<size_t>(in2 + 1) * vs];
      for (int c = 0; c < vs; ++c)
        new_val[c] = old_val[c] + 0.5f * (v1[c] + v2[c]);
    }
    values.swap(new_values);
  }

  // Slice (with the alternating-blur normalization constant).
  const float alpha = 1.f / (1.f + std::pow(2.f, -static_cast<float>(d)));
  std::memset(out, 0, static_cast<size_t>(N_) * vs * sizeof(float));
  for (int n = 0; n < N_; ++n) {
    for (int j = 0; j <= d; ++j) {
      int o = offset_[static_cast<size_t>(n) * (d + 1) + j] + 1;
      float w = barycentric_[static_cast<size_t>(n) * (d + 1) + j];
      for (int c = 0; c < vs; ++c)
        out[static_cast<size_t>(n) * vs + c] +=
            w * values[static_cast<size_t>(o) * vs + c] * alpha;
    }
  }
}

}  // namespace mvp
