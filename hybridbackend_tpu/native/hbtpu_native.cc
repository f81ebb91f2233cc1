// Native host-side hot loops for the TPU input pipeline.
//
// TPU-native equivalent of the reference's C++ data plane
// (/root/reference/hybridbackend/tensorflow/data/rebatch/rebatch_buffer.cc,
// tensorflow/common/arrow.cc, common/murmur3.cu.h): the Arrow decode
// itself is already C++ (pyarrow), so what remains hot on the host are
// the ragged-batch transforms between Arrow buffers and device-ready
// padded layouts. These run once per batch on the input thread and must
// not steal cycles from the Python driver.
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 in this
// image). All functions are single-pass, branch-light, and operate on
// caller-allocated buffers.

#include <cstdint>
#include <cstring>

extern "C" {

// Ragged -> padded-dense + mask. values has `inner` contiguous elements
// per logical item (inner = product of trailing dense dims).
// out: [n, max_len, inner] pre-filled with pad; mask: [n, max_len] u8.
void ragged_to_padded_f32(const float* values, const int64_t* splits,
                          int64_t n, int64_t max_len, int64_t inner,
                          float* out, uint8_t* mask) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t start = splits[i];
    int64_t len = splits[i + 1] - start;
    if (len > max_len) len = max_len;
    std::memcpy(out + (i * max_len) * inner, values + start * inner,
                static_cast<size_t>(len * inner) * sizeof(float));
    std::memset(mask + i * max_len, 1, static_cast<size_t>(len));
  }
}

void ragged_to_padded_i64(const int64_t* values, const int64_t* splits,
                          int64_t n, int64_t max_len, int64_t inner,
                          int64_t* out, uint8_t* mask) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t start = splits[i];
    int64_t len = splits[i + 1] - start;
    if (len > max_len) len = max_len;
    std::memcpy(out + (i * max_len) * inner, values + start * inner,
                static_cast<size_t>(len * inner) * sizeof(int64_t));
    std::memset(mask + i * max_len, 1, static_cast<size_t>(len));
  }
}

void ragged_to_padded_i32(const int32_t* values, const int64_t* splits,
                          int64_t n, int64_t max_len, int64_t inner,
                          int32_t* out, uint8_t* mask) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t start = splits[i];
    int64_t len = splits[i + 1] - start;
    if (len > max_len) len = max_len;
    std::memcpy(out + (i * max_len) * inner, values + start * inner,
                static_cast<size_t>(len * inner) * sizeof(int32_t));
    std::memset(mask + i * max_len, 1, static_cast<size_t>(len));
  }
}

// Ragged row gather (shuffle/dedup-restore): out splits are prefix sums
// of the selected rows' lengths; out values are the selected rows'
// payloads, element size `esize` bytes (dtype-agnostic memcpy).
// Returns total output elements.
int64_t ragged_take_rows(const uint8_t* values, const int64_t* splits,
                         const int64_t* indices, int64_t n_idx,
                         int64_t esize, uint8_t* out_values,
                         int64_t* out_splits) {
  int64_t pos = 0;
  out_splits[0] = 0;
  for (int64_t j = 0; j < n_idx; ++j) {
    int64_t i = indices[j];
    int64_t start = splits[i];
    int64_t len = splits[i + 1] - start;
    std::memcpy(out_values + pos * esize, values + start * esize,
                static_cast<size_t>(len * esize));
    pos += len;
    out_splits[j + 1] = pos;
  }
  return pos;
}

// Dense row gather for arbitrary element size (rebatch/shuffle fast path).
void take_rows_dense(const uint8_t* values, const int64_t* indices,
                     int64_t n_idx, int64_t row_bytes, uint8_t* out) {
  for (int64_t j = 0; j < n_idx; ++j) {
    std::memcpy(out + j * row_bytes, values + indices[j] * row_bytes,
                static_cast<size_t>(row_bytes));
  }
}

// MurmurHash3 64-bit finalizer (reference common/murmur3.cu.h): id
// mixing for shard-balancing hot ids.
void murmur3_mix64(const int64_t* ids, int64_t n, uint64_t modulo,
                   int64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    uint64_t k = static_cast<uint64_t>(ids[i]);
    k ^= k >> 33;
    k *= 0xff51afd7ed558ccdULL;
    k ^= k >> 33;
    k *= 0xc4ceb9fe1a85ec53ULL;
    k ^= k >> 33;
    out[i] = static_cast<int64_t>(modulo ? (k % modulo) : k);
  }
}

}  // extern "C"
