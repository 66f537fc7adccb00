// Permutohedral lattice for high-dimensional Gaussian filtering
// (Adams, Baek, Davis: "Fast High-Dimensional Filtering Using the
// Permutohedral Lattice", EG 2010). Used as the message-passing engine of
// the mean-field DenseCRF (Krähenbühl & Koltun, NeurIPS 2011) — this repo's
// native replacement for the pydensecrf C++ dependency the reference calls
// from evals/models/crf.py.
#pragma once

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace mvp {

// Hash for lattice keys of dimension d.
struct KeyHash {
  size_t operator()(const std::vector<short>& k) const {
    size_t h = 0;
    for (short v : k) h = h * 2531011u + static_cast<size_t>(v + 32768);
    return h;
  }
};

class Permutohedral {
 public:
  // features: d x N (column-major per point: feature j of point i is
  // features[i * d + j])
  void init(const float* features, int d, int N);

  // Filter `value_size` channels: in/out are (value_size x N), channel c of
  // point i at in[i * value_size + c]. Includes the center tap;
  // normalization is up to the caller.
  void compute(float* out, const float* in, int value_size) const;

  int num_lattice_points() const { return M_; }

 private:
  int N_ = 0, d_ = 0, M_ = 0;
  std::vector<int> offset_;          // N * (d+1): lattice-point index per simplex vertex
  std::vector<float> barycentric_;   // N * (d+1)
  std::vector<int> blur_n1_, blur_n2_;  // M * (d+1): neighbours along each axis
};

}  // namespace mvp
