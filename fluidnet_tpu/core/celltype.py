"""Manta cell-type flag bits and vectorized bit tests.

The enum values mirror Manta's grid flags, re-declared by the reference at
torch/tfluids/third_party/cell_type.h:22-33. Flags are stored as int32
arrays of shape (batch, 1, z, y, x); several bits may be set at once
(e.g. Fluid|Inflow in manta-generated data), so all tests are bitwise.
"""

import enum

import jax.numpy as jnp


class CellType(enum.IntEnum):
    TypeNone = 0
    TypeFluid = 1
    TypeObstacle = 2
    TypeEmpty = 4
    TypeInflow = 8
    TypeOutflow = 16
    TypeOpen = 32
    TypeStick = 128
    TypeReserved = 256
    TypeZeroPressure = 1 << 15


def _bit(flags, bit):
    # Flags may arrive as float (the reference stores them as float tensors for
    # CUDA transfer, torch/lib/load_manta_file.lua:33-35); cast like the
    # reference's static_cast<int> (third_party/grid.h:107).
    return (flags.astype(jnp.int32) & int(bit)) > 0


def is_fluid(flags):
    return _bit(flags, CellType.TypeFluid)


def is_obstacle(flags):
    return _bit(flags, CellType.TypeObstacle)


def is_empty(flags):
    return _bit(flags, CellType.TypeEmpty)


def is_outflow(flags):
    return _bit(flags, CellType.TypeOutflow)


def is_stick(flags):
    return _bit(flags, CellType.TypeStick)


def is_inflow(flags):
    return _bit(flags, CellType.TypeInflow)
