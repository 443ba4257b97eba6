// Generalized (scrambled) Halton sequence generation — native core.
//
// TPU-native replacement for the reference's C++ `ghalton` dependency
// (mppi_utils.py:27, 88-95; pyproject.toml:15): radical-inverse points with
// per-base digit permutations.  Called once at planner init through ctypes
// (m3p2i_aip_tpu/native/__init__.py); the pure-numpy implementation in
// ops/sampling.py is the always-available fallback and produces identical
// results by construction (same bases, same permutation tables).
//
// Build: g++ -O3 -march=native -shared -fPIC halton.cpp -o libm3p2i_halton.so

#include <cstdint>

extern "C" {

// out is [num_samples, ndims] row-major.
// perms is the concatenation of one permutation per dim (perm d has length
// bases[d], starts at perm_offsets[d]); pass identity permutations for the
// unscrambled sequence.  Sample indices run 1..num_samples (matching
// mppi_utils.generate_halton_samples:80-96).
void halton_fill(int64_t num_samples, int64_t ndims, const int64_t* bases,
                 const int64_t* perms, const int64_t* perm_offsets,
                 double* out) {
  for (int64_t d = 0; d < ndims; ++d) {
    const int64_t base = bases[d];
    const int64_t* perm = perms + perm_offsets[d];
    const double fbase = static_cast<double>(base);
    for (int64_t i = 0; i < num_samples; ++i) {
      int64_t idx = i + 1;
      double f = 1.0;
      double r = 0.0;
      while (idx > 0) {
        // divide (not multiply-by-inverse): bit-identical to the numpy
        // fallback's rounding so both paths produce the same samples
        f /= fbase;
        r += f * static_cast<double>(perm[idx % base]);
        idx /= base;
      }
      out[i * ndims + d] = r;
    }
  }
}

}  // extern "C"
