# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Native C++ XLA-FFI pipeline tests (mirrors reference
``brainevent/_op/kernix_*_test.py``): codegen parsing, compile-or-cache,
load, register, and end-to-end execution through ``jax.ffi.ffi_call``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brainevent_tpu as be
from brainevent_tpu.ops.cpp import (
    load_cpp_inline, load_cuda_inline,
    parse_annotations, normalize_tokens,
    detect_cpp_toolchain, list_registered_targets,
    get_cache_dir, set_cache_dir,
)
from brainevent_tpu.ops.cpp.codegen import parse_arg_spec
from brainevent_tpu._error import (
    CompilationError, CUDANotInstalledError, KernelCompilationError,
)

SRC_SCALE = r'''
#include "brainevent/tensor.h"

// @BE scale_by_two
void scale_by_two(const BE::Tensor& x, BE::Tensor& out) {
  const float* in = x.data<float>();
  float* o = out.data<float>();
  for (int64_t i = 0; i < x.numel(); ++i) o[i] = in[i] * 2.0f;
}

// @BE add_vectors
void add_vectors(const BE::Tensor& a, const BE::Tensor& b, BE::Tensor& out) {
  for (int64_t i = 0; i < a.numel(); ++i)
    out.data<float>()[i] = a.data<float>()[i] + b.data<float>()[i];
}
'''


class TestCodegen:
    def test_parse_annotations(self):
        specs = parse_annotations(SRC_SCALE)
        assert [s.name for s in specs] == ['scale_by_two', 'add_vectors']
        assert specs[0].n_in == 1 and specs[0].n_out == 1
        assert specs[1].n_in == 2 and specs[1].n_out == 1

    def test_parse_arg_spec_scalars(self):
        args = parse_arg_spec(
            'const BE::Tensor& x, BE::Tensor& y, float alpha, int64_t n')
        assert [a[0] for a in args] == ['in', 'out', 'attr', 'attr']

    def test_bad_param_raises(self):
        with pytest.raises(KernelCompilationError, match='arg spec'):
            parse_arg_spec('std::vector<int> xs')

    def test_no_annotations_raises(self):
        with pytest.raises(KernelCompilationError, match='@BE'):
            parse_annotations('void f(const BE::Tensor& x) {}')

    def test_normalize_tokens(self):
        assert normalize_tokens('  const\n BE::Tensor &x ') == \
            'const BE::Tensor &x'


class TestToolchain:
    def test_detect(self):
        tc = detect_cpp_toolchain()
        assert tc.cxx and tc.xla_include


@pytest.fixture(scope='module')
def cache_tmpdir(tmp_path_factory):
    d = tmp_path_factory.mktemp('cpp_cache')
    old = get_cache_dir()
    set_cache_dir(str(d))
    yield d
    set_cache_dir(old)


class TestEndToEnd:
    def test_compile_load_execute(self, cache_tmpdir):
        mod = load_cpp_inline(SRC_SCALE, name='be_test_scale')
        assert 'be_test_scale.scale_by_two' in mod.targets
        assert 'be_test_scale.scale_by_two' in list_registered_targets()

        x = jnp.arange(8.0, dtype=jnp.float32)
        out = jax.ffi.ffi_call(
            'be_test_scale.scale_by_two',
            jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
        np.testing.assert_allclose(np.asarray(out), np.arange(8.0) * 2)

    def test_two_inputs(self, cache_tmpdir):
        load_cpp_inline(SRC_SCALE, name='be_test_scale')
        a = jnp.ones(5, jnp.float32)
        b = jnp.arange(5.0, dtype=jnp.float32)
        out = jax.ffi.ffi_call(
            'be_test_scale.add_vectors',
            jax.ShapeDtypeStruct(a.shape, a.dtype))(a, b)
        np.testing.assert_allclose(np.asarray(out), np.arange(5.0) + 1)

    def test_under_jit(self, cache_tmpdir):
        load_cpp_inline(SRC_SCALE, name='be_test_scale')
        f = jax.jit(lambda x: jax.ffi.ffi_call(
            'be_test_scale.scale_by_two',
            jax.ShapeDtypeStruct(x.shape, x.dtype))(x))
        np.testing.assert_allclose(np.asarray(f(jnp.ones(4))), 2.0)

    def test_cache_hit(self, cache_tmpdir):
        import brainevent_tpu.ops.cpp.pipeline as pipe
        pipe._loaded_modules.pop('be_test_cache', None)
        m1 = load_cpp_inline(SRC_SCALE, name='be_test_cache')
        so = m1.so_path
        pipe._loaded_modules.pop('be_test_cache', None)
        m2 = load_cpp_inline(SRC_SCALE, name='be_test_cache')
        assert m2.so_path == so  # second load reuses the artifact

    def test_compile_error_message(self, cache_tmpdir):
        bad = '''
// @BE broken
void broken(const BE::Tensor& x, BE::Tensor& out) { this is not C++ }
'''
        with pytest.raises(CompilationError, match='stderr'):
            load_cpp_inline(bad, name='be_test_broken')

    def test_xla_custom_kernel_cpp_backend(self, cache_tmpdir):
        """cpp_ffi as a backend of an XLACustomKernel."""
        from brainevent_tpu.ops.core import XLACustomKernel

        prim = XLACustomKernel('test_cpp_backed_op')

        def cpp_gen(**params):
            load_cpp_inline(SRC_SCALE, name='be_test_scale')
            def kernel(x):
                return (jax.ffi.ffi_call(
                    'be_test_scale.scale_by_two',
                    params['outs'][0])(x),)
            return kernel

        prim.def_cpp_kernel(cpp_gen, asdefault=True)
        prim.def_jax_kernel(lambda **p: (lambda x: (x * 2,)))
        x = jnp.arange(6.0, dtype=jnp.float32)
        (out,) = prim(x, outs=[jax.ShapeDtypeStruct(x.shape, x.dtype)],
                      backend='cpp_ffi')
        np.testing.assert_allclose(np.asarray(out), np.arange(6.0) * 2)


class TestCudaParityStubs:
    def test_load_cuda_raises_with_guidance(self):
        with pytest.raises(CUDANotInstalledError, match='Pallas'):
            load_cuda_inline('__global__ void k() {}', name='x')

    def test_backend_stubs(self):
        from brainevent_tpu.ops.cpp import CUDABackend, HIPBackend
        with pytest.raises(CUDANotInstalledError):
            CUDABackend().compile_source('a', 'b')
        with pytest.raises(CUDANotInstalledError):
            HIPBackend().compile_source('a', 'b')
