# Regenerate docs/api.md: every public name of brainevent_tpu (plus the
# parallel / models.training / ops.mxu_gather / jitc.pallas_kernels
# surfaces) with its first docstring line.
import inspect

import brainevent_tpu as be
from brainevent_tpu.ops.core import XLACustomKernel

HEADER = """# API reference (generated)

Every public name of `brainevent_tpu` (and the `brainevent` drop-in
alias) plus the `parallel`, `models.training`, `ops.mxu_gather` and
`jitc.pallas_kernels` surfaces, with its first docstring line.
Primitives marked `[prim]` are `XLACustomKernel` instances
(multi-backend, jit/grad/vmap-capable).
"""


def first_line(obj):
    doc = inspect.getdoc(obj) or ''
    return doc.split('\n')[0].strip()


def rows(mod, names, prefix=''):
    out = []
    for n in sorted(names, key=str.lower):
        try:
            obj = getattr(mod, n)
        except Exception:
            continue
        tag = ' `[prim]`' if isinstance(obj, XLACustomKernel) else ''
        d = first_line(obj)
        line = f'- **`{prefix}{n}`**{tag}'
        if d:
            line += f' — {d}'
        out.append(line)
    return out


lines = [HEADER]
lines += rows(be, [n for n in dir(be) if not n.startswith('_')] + ['__version__'])

for path in ('parallel', 'models.training', 'ops.mxu_gather',
             'jitc.pallas_kernels'):
    mod = be
    for part in path.split('.'):
        mod = getattr(mod, part, None) or __import__(
            f'brainevent_tpu.{path}', fromlist=[part])
    pub = getattr(mod, '__all__', None) or [
        n for n in dir(mod) if not n.startswith('_')]
    lines.append(f'\n## `brainevent_tpu.{path}`\n')
    lines += rows(mod, pub)

with open('docs/api.md', 'w') as f:
    f.write('\n'.join(lines) + '\n')
print('wrote docs/api.md,', len(lines), 'lines')
