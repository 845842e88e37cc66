"""Grid state pytree and basic grid utilities.

The reference wraps 5-D torch tensors in C++ FlagGrid/RealGrid/MACGrid/VecGrid
classes (torch/tfluids/third_party/grid.h). Here the grid *is* the array: all
fields are jnp arrays of shape (batch, channel, z, y, x); MAC velocity has
2 (2-D) or 3 (3-D) channels; 2-D domains always use z == 1.

Coordinate convention matches the reference exactly: index (i, j, k) maps to
axes (x, y, z) = array axes (-1, -2, -3); cell centers sit at integer+0.5.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.celltype import CellType, is_fluid, is_obstacle


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FluidState:
    """Simulation state; every field is (batch, c, z, y, x).

    Mirrors the reference batch dict {pDiv, UDiv, flags, density}
    (torch/lib/simulate.lua:25-31).
    """

    u: jax.Array          # MAC velocity, c in {2, 3}.
    p: jax.Array          # pressure, c == 1.
    flags: jax.Array      # int32 cell-type flags, c == 1.
    density: Optional[jax.Array] = None  # advected scalar(s), c >= 1.

    @property
    def is_3d(self) -> bool:
        return self.u.shape[1] == 3

    def replace(self, **kw) -> "FluidState":
        return dataclasses.replace(self, **kw)


def check_shapes(u, flags, *others):
    """Validates the always-5D convention (torch/tfluids/init.lua:100-115)."""
    assert u.ndim == 5 and flags.ndim == 5, "tensors must be 5-D"
    assert flags.shape[1] == 1, "flags must be scalar"
    is_3d = u.shape[1] == 3
    if not is_3d:
        assert u.shape[1] == 2, "2-D velocity must have 2 channels"
        assert u.shape[2] == 1, "2-D grid must have z == 1"
    assert u.shape[0] == flags.shape[0] and u.shape[2:] == flags.shape[2:]
    for o in others:
        if o is not None:
            assert o.ndim == 5 and o.shape[2:] == flags.shape[2:]
    return is_3d


def get_dx(flags_or_shape) -> float:
    """Manta's Simulator::getDx: 1 / max grid dimension.

    Reference: torch/tfluids/init.lua:560-565, third_party/grid.cc:37-40.
    """
    if hasattr(flags_or_shape, "shape"):
        shape = flags_or_shape.shape
    else:
        shape = flags_or_shape
    z, y, x = shape[-3], shape[-2], shape[-1]
    return 1.0 / float(max(x, max(y, z)))


def border_mask(shape, is_3d: bool, bnd: int = 1) -> jax.Array:
    """Boolean (1, 1, z, y, x) mask, True on the `bnd`-wide domain border.

    Every reference kernel special-cases this region (e.g.
    third_party/tfluids.cc:477-484). In 2-D the z border is not included.
    """
    z, y, x = shape[-3], shape[-2], shape[-1]
    xi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, z, y, x), 4)
    yi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, z, y, x), 3)
    m = (xi < bnd) | (xi > x - 1 - bnd) | (yi < bnd) | (yi > y - 1 - bnd)
    if is_3d:
        zi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, z, y, x), 2)
        m = m | (zi < bnd) | (zi > z - 1 - bnd)
    return m


def empty_domain(shape, is_3d: bool, bnd: int = 1, dtype=jnp.int32) -> jax.Array:
    """Flags grid: TypeFluid inside, TypeObstacle on a bnd-wide border.

    Reference: torch/tfluids/generic/tfluids.cc:136-169 (Main_emptyDomain) and
    torch/tfluids/init.lua:545-555.
    `shape` is (batch, 1, z, y, x).
    """
    assert len(shape) == 5 and shape[1] == 1
    m = border_mask(shape, is_3d, bnd)
    flags = jnp.where(m, int(CellType.TypeObstacle), int(CellType.TypeFluid))
    return jnp.broadcast_to(flags, shape).astype(dtype)


def flags_to_occupancy(flags) -> jax.Array:
    """Flags -> {0, 1} obstacle-occupancy grid (float).

    Reference: torch/tfluids/generic/tfluids.cc:175-210; fluid -> 0,
    obstacle -> 1. The reference hard-errors on any other cell type; here we
    map any cell with the obstacle bit set to 1 and all others to 0, which is
    equivalent on reference-valid data.
    """
    return is_obstacle(flags).astype(jnp.float32)


def zero_state(batch, size_xyz, is_3d: bool, n_density: int = 1,
               dtype=jnp.float32) -> FluidState:
    """Allocates an empty-domain state, mirroring fluid_net_3d_sim.lua:62-69."""
    x, y, z = size_xyz
    if not is_3d:
        assert z == 1
    cu = 3 if is_3d else 2
    u = jnp.zeros((batch, cu, z, y, x), dtype)
    p = jnp.zeros((batch, 1, z, y, x), dtype)
    flags = empty_domain((batch, 1, z, y, x), is_3d)
    density = jnp.zeros((batch, n_density, z, y, x), dtype)
    return FluidState(u=u, p=p, flags=flags, density=density)
