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

"""Defaults-vs-measurements audit (VERDICT r3 item 3).

Walks the committed hardware benchmark grid (``BENCH_PRIMS_BEST.json`` —
the newest-round merge of every measured grid r02-r05, built by
``scripts/merge_bench_prims_best.py``; measured on a real TPU with the
K-vs-1 fused-loop protocol) and asserts that
for every (primitive, config) group with more than one measured backend, the
registered TPU **default** backend is the measured winner — or within the
measurement noise band — or the losing default carries an explicit ``note``
on its registration explaining why it is kept.

This is the CI guard against the round-3 failure mode where a default could
silently contradict its own benchmark rows (the reference audits the same
risk by persisting per-GPU tuner winners,
``brainevent/_csr/initialize.py``). Direction-dependent winners are handled
naturally: the grid keys contain the direction (``T``/``NT``), and each
config group is audited independently against the same default, so a
direction-dependent winner that the default cannot express MUST be justified
with a note or a direction-aware default.
"""

import collections
import json
import os

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRID_PATH = os.path.join(REPO_ROOT, 'BENCH_PRIMS_BEST.json')

# Per-call times below this are inside the relay-differencing noise floor
# (BENCH_NOTES.md: day-to-day variance ~5%, sub-us ops often read 0.0 with
# metadata.unresolved=True) — any backend this fast is an acceptable default.
NOISE_FLOOR_US = 5.0
# Relative band: a default within 1.3x of the winner is measurement noise,
# not a wrong default (same-day band on repeated runs is ~5-15%).
REL_BAND = 1.3


def _load_groups():
    rows = json.load(open(GRID_PATH))
    groups = collections.defaultdict(dict)
    for r in rows:
        if 'error' in r or 'us_per_call' not in r:
            continue
        base, backend = r['name'].rsplit('[', 1)
        backend = backend.rstrip(']')
        unresolved = bool(r.get('metadata', {}).get('unresolved', False))
        us = r['us_per_call']
        if unresolved:
            # differencing could not resolve the op above the relay floor:
            # the true cost is below ~NOISE_FLOOR_US
            us = min(us, NOISE_FLOOR_US) if us else 0.0
        groups[base][backend] = us
    return groups


def _multi_backend_groups():
    groups = _load_groups()
    return sorted(k for k, v in groups.items() if len(v) > 1)


@pytest.fixture(scope='module')
def registry():
    import brainevent_tpu as be
    return be.get_registry()


def test_grid_exists_and_parses():
    groups = _load_groups()
    assert len(groups) > 40, 'benchmark grid unexpectedly small'
    assert any(len(v) > 1 for v in groups.values())


@pytest.mark.parametrize('group', _multi_backend_groups())
def test_tpu_default_is_measured_winner_or_noted(group, registry):
    groups = _load_groups()
    times = groups[group]
    prim_name = group.split('[', 1)[0]
    # class-route grids benchmark under synthetic names (<prim>_plan,
    # <prim>_dense_route); the underlying primitive is <prim>
    lookup = prim_name
    for suffix in ('_plan', '_dense_route'):
        if lookup.endswith(suffix):
            lookup = lookup[: -len(suffix)]
    prim = registry.get(lookup)
    assert prim is not None, f'grid row for unregistered primitive {lookup!r}'

    table = prim._kernels.get('tpu', {})
    default = prim._defaults.get('tpu') or next(iter(table), None)
    assert default is not None

    # resolve aliases: if the default is an alias, the measured row it maps
    # to is the alias target's row
    entry = table.get(default)
    measured_name = entry.alias_of if (entry and entry.alias_of) else default

    winner_backend = min(times, key=times.get)
    winner = times[winner_backend]
    if measured_name not in times:
        if prim_name.endswith(('_plan', '_dense_route')):
            # the plan grid measures the explicit plan route vs the
            # primitive default; the default's own row is the jax_raw one
            measured_name = 'jax_raw'
        else:
            pytest.skip(f'default backend {measured_name!r} has no row in {group}')
    default_time = times[measured_name]

    within_band = default_time <= max(REL_BAND * winner,
                                      winner + 2.0,
                                      NOISE_FLOOR_US)
    if prim_name.endswith(('_plan', '_dense_route')):
        # class-route rows compare the class-layer fast path against the
        # primitive default; the primitive default losing HERE is expected
        # (that is what the class route is for) as long as the class layer
        # auto-routes products through it (test_csr/test_jitc_plan/
        # test_r4_features cover that).
        return
    noted = bool(entry and entry.note)
    assert within_band or noted, (
        f'TPU default {default!r} (measured as {measured_name!r}, '
        f'{default_time:.2f} us/call) loses to {winner_backend!r} '
        f'({winner:.2f} us/call) on {group} with no registration note. '
        f'Flip the default, make it config-aware, or register the default '
        f'with note= citing the measurement that justifies keeping it.'
    )
