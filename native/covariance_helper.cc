// Covariance pack/unpack helper for object-state messages.
//
// C++ equivalent of the reference's only native component
// (`/root/reference/src/ros_messages/object_msgs/include/object_msgs/
// covariance_helper.h`, Eigen-based): object messages carry the upper
// triangle of a symmetric covariance matrix as a flat float array; these
// helpers convert between the packed triangle and the full row-major matrix.
// Implemented Eigen-free (plain loops) and exported with a C ABI for ctypes.
//
// Build: make -C native   (part of libyp_preprocess.so)

#include <cstdint>

extern "C" {

// Number of packed elements for an n x n symmetric matrix.
int64_t yp_cov_packed_size(int n) { return static_cast<int64_t>(n) * (n + 1) / 2; }

// Full row-major (n*n) -> packed upper triangle (row-major over the
// triangle: (0,0), (0,1)...(0,n-1), (1,1), ...).
void yp_cov_pack_upper(const float* full, int n, float* packed) {
  int64_t k = 0;
  for (int i = 0; i < n; ++i)
    for (int j = i; j < n; ++j) packed[k++] = full[i * n + j];
}

// Packed upper triangle -> full symmetric row-major matrix.
void yp_cov_unpack_upper(const float* packed, int n, float* full) {
  int64_t k = 0;
  for (int i = 0; i < n; ++i) {
    for (int j = i; j < n; ++j) {
      full[i * n + j] = packed[k];
      full[j * n + i] = packed[k];
      ++k;
    }
  }
}

}  // extern "C"
