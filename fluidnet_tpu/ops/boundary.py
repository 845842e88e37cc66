"""setWallBcs: zero MAC face velocities at fluid/obstacle interfaces.

Vectorized port of the semantics of Main_setWallBcsForward
(torch/tfluids/third_party/tfluids.cc:926-1002). Assumes zero-velocity
obstacles (reference README.md:287). Pure function (the reference mutates
in place); differentiable — the adjoint is the same 0/1 masking the
reference hand-codes in torch/tfluids/set_wall_bcs.lua:50-64, and XLA
derives it automatically from the `where`.
"""

import jax.numpy as jnp

from fluidnet_tpu.core.celltype import is_fluid, is_obstacle, is_stick
from fluidnet_tpu.core.grids import check_shapes
from fluidnet_tpu.ops import stencil as st


def set_wall_bcs(u, flags):
    """Returns U with wall boundary conditions applied.

    For every cell that is fluid or obstacle (others untouched):
      - u.x(i) = 0 if i > 0 and obstacle(i-1)              [fluid faces into obs]
      - u.x(i) = 0 if i > 0 and cur is obstacle and fluid(i-1)
      (same for y with j, z with k)
    For fluid cells next to TypeStick cells, tangential components zero.
    """
    is_3d = check_shapes(u, flags)

    fl = is_fluid(flags)      # (b,1,z,y,x) bool
    ob = is_obstacle(flags)
    stick = is_stick(flags)
    cur = fl | ob

    # "i > 0" is implicit: shifted masks fill False at the low edge.
    obs_xm = st.xm(ob, fill=False)
    obs_ym = st.ym(ob, fill=False)
    flu_xm = st.xm(fl, fill=False)
    flu_ym = st.ym(fl, fill=False)

    zero_x = cur & (obs_xm | (ob & flu_xm))
    zero_y = cur & (obs_ym | (ob & flu_ym))

    # Stick walls: zero tangential components of fluid cells adjacent (in +/-
    # direction) to stick cells (tfluids.cc:974-995).
    stick_xpm = st.xm(stick, fill=False) | st.xp(stick, fill=False)
    stick_ypm = st.ym(stick, fill=False) | st.yp(stick, fill=False)

    ux = jnp.where(zero_x[:, 0], jnp.zeros_like(u[:, 0]), u[:, 0])
    uy = jnp.where(zero_y[:, 0], jnp.zeros_like(u[:, 1]), u[:, 1])
    ux = jnp.where((fl & stick_ypm)[:, 0], 0.0, ux)
    uy = jnp.where((fl & stick_xpm)[:, 0], 0.0, uy)

    if is_3d:
        obs_zm = st.zm(ob, fill=False)
        flu_zm = st.zm(fl, fill=False)
        zero_z = cur & (obs_zm | (ob & flu_zm))
        stick_zpm = st.zm(stick, fill=False) | st.zp(stick, fill=False)
        uz = jnp.where(zero_z[:, 0], jnp.zeros_like(u[:, 2]), u[:, 2])
        uz = jnp.where((fl & (stick_xpm | stick_ypm))[:, 0], 0.0, uz)
        ux = jnp.where((fl & stick_zpm)[:, 0], 0.0, ux)
        uy = jnp.where((fl & stick_zpm)[:, 0], 0.0, uy)
        return jnp.stack([ux, uy, uz], axis=1)
    return jnp.stack([ux, uy], axis=1)
