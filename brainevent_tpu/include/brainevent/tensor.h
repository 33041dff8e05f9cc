// Copyright 2026 The brainevent-tpu Authors.
// Licensed under the Apache License, Version 2.0.
//
// BE::Tensor — a dtype-tagged shape/stride view over an XLA FFI buffer.
// Capability parity with the reference's include/brainevent/tensor.h
// (dtype enum + typed data access + shape queries), re-designed as a
// minimal header for CPU XLA-FFI custom kernels.

#ifndef BRAINEVENT_TPU_TENSOR_H_
#define BRAINEVENT_TPU_TENSOR_H_

#include <cstdint>
#include <cstddef>

namespace BE {

enum class DType : int32_t {
  kInvalid = 0,
  kPred = 1,
  kS8 = 2,
  kS16 = 3,
  kS32 = 4,
  kS64 = 5,
  kU8 = 6,
  kU16 = 7,
  kU32 = 8,
  kU64 = 9,
  kF16 = 10,
  kF32 = 11,
  kF64 = 12,
  kBF16 = 13,
};

constexpr int kMaxDims = 8;

// Non-owning dtype-tagged view of a dense row-major buffer.
struct Tensor {
  void* data_ = nullptr;
  DType dtype_ = DType::kInvalid;
  int64_t ndim_ = 0;
  int64_t dims_[kMaxDims] = {0};

  template <typename T>
  T* data() const { return static_cast<T*>(data_); }

  DType dtype() const { return dtype_; }
  int64_t ndim() const { return ndim_; }
  int64_t dim(int i) const { return dims_[i]; }

  int64_t numel() const {
    int64_t n = 1;
    for (int64_t i = 0; i < ndim_; ++i) n *= dims_[i];
    return n;
  }
};

}  // namespace BE

#endif  // BRAINEVENT_TPU_TENSOR_H_
