"""FluidNet training loss.

Port of nn.FluidCriterion (torch/lib/modules/fluid_criterion.lua:29-258):

  L = pLambda * wMSE(p, pTarget) + uLambda * wMSE(U, UTarget)
    + divLambda * wMSE(div(U, flags), 0)

with optional border weighting: the weight ramps from borderWeight next to
obstacles down to 1 at distance borderWidth (via the signed distance field,
fluid_criterion.lua:145-159). wMSE is mean((w*a - w*b)^2) — the weight is
applied to input AND target, so it enters squared
(weighted_flat_mse_criterion.lua:35-41).
"""

from typing import Optional

import jax.numpy as jnp

from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.ops.sdf import signed_distance_field


def border_loss_weights(flags, border_weight: float, border_width: int):
    """Inverse-distance ramp: weight in [1, border_weight], border_weight at
    cells adjacent to obstacles (fluid_criterion.lua:145-158)."""
    w = signed_distance_field(flags, border_width)
    w = jnp.clip(w, 1.0, float(border_width)) - 1.0        # [0, width-1]
    w = w * (-1.0 / (border_width - 1)) + 1.0              # [1, 0] adj->far
    return w * (border_weight - 1.0) + 1.0                 # [weight, 1]


def _wmse(a, b, w):
    if w is None:
        return jnp.mean((a - b) ** 2)
    return jnp.mean((w * a - w * b) ** 2)


def fluid_loss(mconf: ModelConfig, p_pred, u_pred, p_target, u_target, flags,
               p_lambda: Optional[float] = None,
               u_lambda: Optional[float] = None,
               div_lambda: Optional[float] = None,
               weights=None):
    """Returns (total, {'p': ..., 'u': ..., 'div': ...}).

    Lambda overrides support the training loop's temporary re-weighting for
    the long-term term (run_epoch.lua:273-298). `weights` can carry a
    precomputed border-weight field (static flags -> compute once).
    """
    p_lambda = mconf.loss_p_lambda if p_lambda is None else p_lambda
    u_lambda = mconf.loss_u_lambda if u_lambda is None else u_lambda
    div_lambda = mconf.loss_div_lambda if div_lambda is None else div_lambda

    w = weights
    if w is None and mconf.loss_func_border_weight != 1.0:
        w = border_loss_weights(flags, mconf.loss_func_border_weight,
                                mconf.loss_func_border_width)

    terms = {}
    total = 0.0
    if p_lambda != 0.0 or not isinstance(p_lambda, float):
        terms["p"] = p_lambda * _wmse(p_pred, p_target, w)
        total = total + terms["p"]
    else:
        terms["p"] = jnp.asarray(0.0)
    if u_lambda != 0.0 or not isinstance(u_lambda, float):
        terms["u"] = u_lambda * _wmse(u_pred, u_target, w)
        total = total + terms["u"]
    else:
        terms["u"] = jnp.asarray(0.0)
    div = velocity_divergence(u_pred, flags)
    terms["div"] = div_lambda * _wmse(div, jnp.zeros_like(div), w)
    total = total + terms["div"]
    return total, terms
