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

"""Command-line interface (reference ``brainevent/_cli.py``).

``brainevent-tpu benchmark-performance --platform tpu --data csr binary``
runs every registered primitive matching the given tags over its
benchmark-data grid and prints/saves the results.
"""

import argparse
import json
import sys
from typing import List, Optional

__all__ = ['main']


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog='brainevent-tpu',
        description='brainevent-tpu: TPU-native event-driven sparse operators.',
    )
    sub = parser.add_subparsers(dest='command')

    bench = sub.add_parser(
        'benchmark-performance',
        help='Benchmark registered primitives filtered by tags.',
    )
    bench.add_argument('--platform', default=None,
                       choices=['cpu', 'gpu', 'tpu'],
                       help='Platform to benchmark (default: current).')
    bench.add_argument('--data', nargs='*', default=[],
                       help='Tag filter, e.g. --data csr binary.')
    bench.add_argument('--output', default=None,
                       help='Write results as JSON to this path.')
    bench.add_argument('--n-runs', type=int, default=10)
    bench.add_argument('--n-warmup', type=int, default=3)
    bench.add_argument('--iterations', type=int, default=1,
                       help='Op applications fused per device call '
                            '(use >=1000 on relay-attached accelerators).')
    bench.add_argument('--max-configs', type=int, default=0,
                       help='Bench at most N configs per primitive '
                            '(0 = all); remote-compile cost scales with '
                            'configs x backends.')

    lst = sub.add_parser('list-primitives',
                         help='List registered primitives and their tags.')
    lst.add_argument('--data', nargs='*', default=[], help='Tag filter.')

    tune = sub.add_parser(
        'tune',
        help='Auto-tune strategy crossovers on the live device and persist '
             'them per device generation (CI counterpart of the reference '
             'per-GPU hybrid tuner, brainevent/_csr/initialize.py).',
    )
    tune.add_argument('--sizes', nargs='+', type=int,
                      default=[4096, 40960, 409600],
                      help='Output sizes to probe the MXU-scatter crossover '
                           'at (ascending).')
    tune.add_argument('--rates', nargs='+', type=float,
                      default=[0.001, 0.01, 0.1],
                      help='Event rates each size must win at.')
    tune.add_argument('--iterations', type=int, default=1000,
                      help='Op applications fused per device call '
                           '(>=1000 on relay-attached accelerators).')
    tune.add_argument('--no-persist', action='store_true',
                      help='Measure and print only; do not write the '
                           'per-device-kind config JSON.')
    tune.add_argument('--output', default=None,
                      help='Also write the chosen config as JSON here.')
    return parser


def _run_benchmark(args) -> int:
    import brainevent_tpu as be  # populates the registry
    from brainevent_tpu._error import BenchmarkDataFnNotProvidedError

    prims = be.get_primitives_by_tags(set(args.data))
    if not prims:
        print(f'No primitives match tags {args.data}; registered: '
              f'{be.get_all_primitive_names()}', file=sys.stderr)
        return 1
    all_records = []
    for name in sorted(prims):
        prim = prims[name]
        try:
            result = prim.benchmark(platform=args.platform,
                                    n_runs=args.n_runs,
                                    n_warmup=args.n_warmup,
                                    iterations=args.iterations,
                                    max_configs=args.max_configs)
        except BenchmarkDataFnNotProvidedError:
            continue
        except Exception as e:  # noqa: BLE001 - sweep must survive one kernel
            print(f'{name}: FAILED {type(e).__name__}: {str(e)[:200]}',
                  file=sys.stderr)
            all_records.append({'name': name, 'error': str(e)[:500]})
            continue
        all_records.extend(r.to_dict() for r in result.records)
    if args.output:
        with open(args.output, 'w') as f:
            json.dump(all_records, f, indent=2)
        print(f'Wrote {len(all_records)} records to {args.output}')
    return 0


def _list_primitives(args) -> int:
    import brainevent_tpu as be
    prims = be.get_primitives_by_tags(set(args.data))
    for name in sorted(prims):
        prim = prims[name]
        backends = {}
        for p in ('cpu', 'gpu', 'tpu'):
            backends[p] = [
                e['backend'] + (f"->alias({e['alias_of']})"
                                if e['alias_of'] else '')
                for e in prim.backend_info(p)
            ]
        print(f'{name:<40s} tags={sorted(prim.tags)} backends={backends}')
    return 0


def _run_tune(args) -> int:
    import dataclasses

    import jax

    from brainevent_tpu.csr.initialize import init_csr_config

    print(f'Tuning on {jax.devices()[0].device_kind} '
          f'(platform {jax.default_backend()}) ...', flush=True)
    cfg = init_csr_config(ns=tuple(args.sizes), rates=tuple(args.rates),
                          iterations=args.iterations,
                          persist=not args.no_persist, verbose=True)
    payload = dataclasses.asdict(cfg)
    print(json.dumps(payload))
    if args.output:
        with open(args.output, 'w') as f:
            json.dump(payload, f, indent=2)
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    parser = _build_parser()
    args = parser.parse_args(argv)
    if args.command == 'benchmark-performance':
        return _run_benchmark(args)
    if args.command == 'list-primitives':
        return _list_primitives(args)
    if args.command == 'tune':
        return _run_tune(args)
    parser.print_help()
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
