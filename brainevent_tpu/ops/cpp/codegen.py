# Copyright 2026 The brainevent-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.
# ==============================================================================

"""C++ XLA-FFI wrapper generation (reference ``brainevent/_op/kernix_codegen.py``).

Users write plain C++ functions over ``BE::Tensor`` views and mark exports
with ``// @BE <name>`` comment annotations; this module parses the
signatures, infers the argument spec (``const BE::Tensor&`` -> input,
``BE::Tensor&`` -> output, scalar types -> attributes), and emits one
``XLA_FFI_DEFINE_HANDLER_SYMBOL`` wrapper + C getter per export.
"""

import dataclasses
import re
from typing import List, Tuple

from ..._error import KernelCompilationError

__all__ = ['FunctionSpec', 'parse_annotations', 'parse_arg_spec',
           'generate_ffi_wrapper', 'preprocess_source', 'normalize_tokens']

_SCALAR_TYPES = {
    'float': 'float',
    'double': 'double',
    'int32_t': 'int32_t',
    'int64_t': 'int64_t',
    'bool': 'bool',
}


@dataclasses.dataclass
class FunctionSpec:
    """One exported function: name + (kind, ctype, param-name) triples.

    ``kind`` is ``'in'``, ``'out'``, or ``'attr'``.
    """
    name: str
    args: List[Tuple[str, str, str]]

    @property
    def n_in(self) -> int:
        return sum(1 for k, _, _ in self.args if k == 'in')

    @property
    def n_out(self) -> int:
        return sum(1 for k, _, _ in self.args if k == 'out')

    @property
    def attrs(self):
        return [(c, n) for k, c, n in self.args if k == 'attr']


def normalize_tokens(src: str) -> str:
    """Collapse whitespace for signature parsing."""
    return re.sub(r'\s+', ' ', src).strip()


_ANNOT_RE = re.compile(
    r'//\s*@BE\s+(\w+)\s*\n\s*'
    r'(?:[\w:<>]+\s+)?(\w+)\s*\(([^)]*)\)',
    re.MULTILINE,
)


def parse_arg_spec(params: str) -> List[Tuple[str, str, str]]:
    """Parse a C++ parameter list into (kind, ctype, name) triples."""
    args = []
    params = params.strip()
    if not params:
        return args
    for i, raw in enumerate(params.split(',')):
        tok = normalize_tokens(raw)
        m = re.match(r'const\s+BE::Tensor\s*&\s*(\w+)', tok)
        if m:
            args.append(('in', 'BE::Tensor', m.group(1)))
            continue
        m = re.match(r'BE::Tensor\s*&\s*(\w+)', tok)
        if m:
            args.append(('out', 'BE::Tensor', m.group(1)))
            continue
        m = re.match(r'(?:const\s+)?(\w+)\s+(\w+)', tok)
        if m and m.group(1) in _SCALAR_TYPES:
            args.append(('attr', m.group(1), m.group(2)))
            continue
        raise KernelCompilationError(
            f'Cannot infer FFI arg spec for parameter {raw!r}. Supported: '
            f'`const BE::Tensor&` (input), `BE::Tensor&` (output), scalar '
            f'attrs {sorted(_SCALAR_TYPES)}.'
        )
    return args


def parse_annotations(src: str) -> List[FunctionSpec]:
    """Find every ``// @BE name`` export and parse its signature.

    ``name`` is the public export name; the C++ function immediately below
    the annotation is the implementation (the annotation may rename it).
    """
    specs = []
    for m in _ANNOT_RE.finditer(src):
        export_name, fn_name, params = m.groups()
        spec = FunctionSpec(name=fn_name, args=parse_arg_spec(params))
        spec.export = export_name  # type: ignore[attr-defined]
        specs.append(spec)
    if not specs:
        raise KernelCompilationError(
            'No `// @BE <name>` export annotations found in the source.')
    return specs


_PRELUDE = r'''
#include "xla/ffi/api/ffi.h"
#include "brainevent/tensor.h"

namespace be_ffi {

inline BE::Tensor from_buffer(xla::ffi::AnyBuffer& buf) {
  BE::Tensor t;
  t.data_ = buf.untyped_data();
  t.dtype_ = static_cast<BE::DType>(0);
  switch (buf.element_type()) {
    case xla::ffi::DataType::PRED: t.dtype_ = BE::DType::kPred; break;
    case xla::ffi::DataType::S8:   t.dtype_ = BE::DType::kS8; break;
    case xla::ffi::DataType::S16:  t.dtype_ = BE::DType::kS16; break;
    case xla::ffi::DataType::S32:  t.dtype_ = BE::DType::kS32; break;
    case xla::ffi::DataType::S64:  t.dtype_ = BE::DType::kS64; break;
    case xla::ffi::DataType::U8:   t.dtype_ = BE::DType::kU8; break;
    case xla::ffi::DataType::U16:  t.dtype_ = BE::DType::kU16; break;
    case xla::ffi::DataType::U32:  t.dtype_ = BE::DType::kU32; break;
    case xla::ffi::DataType::U64:  t.dtype_ = BE::DType::kU64; break;
    case xla::ffi::DataType::F16:  t.dtype_ = BE::DType::kF16; break;
    case xla::ffi::DataType::F32:  t.dtype_ = BE::DType::kF32; break;
    case xla::ffi::DataType::F64:  t.dtype_ = BE::DType::kF64; break;
    case xla::ffi::DataType::BF16: t.dtype_ = BE::DType::kBF16; break;
    default: break;
  }
  auto dims = buf.dimensions();
  t.ndim_ = static_cast<int64_t>(dims.size());
  for (int64_t i = 0; i < t.ndim_ && i < BE::kMaxDims; ++i) t.dims_[i] = dims[i];
  return t;
}

}  // namespace be_ffi
'''


def generate_ffi_wrapper(spec: FunctionSpec) -> str:
    """Emit the XLA-FFI handler + C getter for one exported function."""
    sig_parts = []
    call_parts = []
    bind_parts = []
    for kind, ctype, name in spec.args:
        if kind == 'in':
            sig_parts.append(f'xla::ffi::AnyBuffer {name}')
            call_parts.append(f'be_ffi::from_buffer({name})')
            bind_parts.append('.Arg<xla::ffi::AnyBuffer>()')
        elif kind == 'out':
            sig_parts.append(f'xla::ffi::Result<xla::ffi::AnyBuffer> {name}')
            call_parts.append(f'be_ffi::from_buffer(*{name})')
            bind_parts.append('.Ret<xla::ffi::AnyBuffer>()')
        else:
            sig_parts.append(f'{ctype} {name}')
            call_parts.append(name)
            bind_parts.append(f'.Attr<{ctype}>("{name}")')

    export = getattr(spec, 'export', spec.name)
    call_args = []
    i = 0
    for kind, ctype, name in spec.args:
        if kind == 'in':
            call_args.append(f'auto t_{name} = be_ffi::from_buffer({name});')
        elif kind == 'out':
            call_args.append(f'auto t_{name} = be_ffi::from_buffer(*{name});')
        i += 1
    inner_args = ', '.join(
        (f't_{name}' if kind != 'attr' else name)
        for kind, _, name in spec.args)

    return f'''
static xla::ffi::Error be_wrap_{export}({", ".join(sig_parts)}) {{
  {' '.join(call_args)}
  {spec.name}({inner_args});
  return xla::ffi::Error::Success();
}}

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    be_handler_{export}, be_wrap_{export},
    xla::ffi::Ffi::Bind(){"".join(bind_parts)});

extern "C" XLA_FFI_Handler* be_get_{export}() {{
  return be_handler_{export};
}}
'''


def preprocess_source(src: str, specs: List[FunctionSpec]) -> str:
    """Splice the FFI prelude + generated wrappers around the user source."""
    wrappers = '\n'.join(generate_ffi_wrapper(s) for s in specs)
    return f'{_PRELUDE}\n{src}\n{wrappers}\n'
