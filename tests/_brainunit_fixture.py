# Copyright 2026 The brainevent-tpu Authors.
# Licensed under the Apache License, Version 2.0.

"""Minimal vendored stand-in for ``brainunit`` (absent in this image).

Implements exactly the surface ``brainevent_tpu.units`` consumes —
``Quantity``, ``split_mantissa_unit``, ``get_mantissa``, ``maybe_decimal``,
and unit algebra (``Unit * Unit``, ``array * Unit``) — with symbolic
dimension exponents, so the package's unit-aware wrapper paths
(reference contract: ``/root/reference/brainevent/_csr/binary.py:248-260``)
can be exercised for real. Tests inject this module as ``brainunit`` in
``sys.modules`` and reload ``brainevent_tpu.units``.
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ['Unit', 'Quantity', 'split_mantissa_unit', 'get_mantissa',
           'maybe_decimal', 'mV', 'ms', 'siemens', 'DIMENSIONLESS']

_BASE = ('V', 'A', 's')   # enough base dimensions for the test surface


@dataclasses.dataclass(frozen=True)
class Unit:
    dims: Tuple[int, ...] = (0,) * len(_BASE)
    scale: float = 1.0
    name: str = '1'

    @property
    def is_dimensionless(self) -> bool:
        return all(d == 0 for d in self.dims)

    def __mul__(self, other):
        if isinstance(other, Unit):
            return Unit(tuple(a + b for a, b in zip(self.dims, other.dims)),
                        self.scale * other.scale,
                        f'{self.name}*{other.name}')
        return Quantity(jnp.asarray(other), self)

    __rmul__ = __mul__

    def __truediv__(self, other):
        assert isinstance(other, Unit)
        return Unit(tuple(a - b for a, b in zip(self.dims, other.dims)),
                    self.scale / other.scale, f'{self.name}/{other.name}')

    def __eq__(self, other):
        return (isinstance(other, Unit) and self.dims == other.dims
                and self.scale == other.scale)

    def __hash__(self):
        return hash((self.dims, self.scale))


DIMENSIONLESS = Unit()
mV = Unit((1, 0, 0), 1e-3, 'mV')
ms = Unit((0, 0, 1), 1e-3, 'ms')
siemens = Unit((-1, 1, 0), 1.0, 'S')


class Quantity:
    def __init__(self, mantissa, unit: Unit):
        self.mantissa = jnp.asarray(mantissa)
        self.unit = unit

    @property
    def shape(self):
        return self.mantissa.shape

    @property
    def dtype(self):
        return self.mantissa.dtype

    def __mul__(self, other):
        if isinstance(other, Unit):
            return Quantity(self.mantissa, self.unit * other)
        if isinstance(other, Quantity):
            return Quantity(self.mantissa * other.mantissa,
                            self.unit * other.unit)
        return Quantity(self.mantissa * jnp.asarray(other), self.unit)

    __rmul__ = __mul__

    def __repr__(self):
        return f'Quantity({self.mantissa!r}, {self.unit.name})'


jax.tree_util.register_pytree_node(
    Quantity,
    lambda q: ((q.mantissa,), q.unit),
    lambda unit, children: Quantity(children[0], unit),
)


def split_mantissa_unit(x):
    if isinstance(x, Quantity):
        return x.mantissa, x.unit
    return jnp.asarray(x), DIMENSIONLESS


def get_mantissa(x):
    return x.mantissa if isinstance(x, Quantity) else x


def maybe_decimal(x):
    """Collapse dimensionless quantities back to plain arrays."""
    if isinstance(x, Quantity) and x.unit.is_dimensionless:
        return x.mantissa
    return x
