"""The learned pressure-projection ConvNet.

Functional JAX re-design of torch.defineModelGraph (torch/lib/model.lua:27-401)
and the conv factory (torch/lib/model_utils.lua). Instead of an nngraph of
stateful modules, the model is (init_model, apply_model): a params pytree and
a pure function — physics ops (setWallBcs, divergence, occupancy, velocity
update) are ordinary differentiable functions inlined in the forward pass, so
the whole projection is one fused XLA computation.

Architecture (model.lua:27-401):
  input {pDiv, UDiv, flags}
  -> setWallBcs(UDiv)                                 (model.lua:83)
  -> div = velocityDivergence(UDiv)                   (:87)
  -> per-sample scale s = std|norm of a chosen field  (:92-131)
  -> concat([pDiv,] [UDiv,] div, occupancy(flags))    (:134-150)
  -> conv trunk (modelType default|tog|yang; optional multi-resolution
     banks with pyramid split / nearest-upsample join, dilation banks,
     weight sharing; low-rank factorized convs; upsampling convs; gated
     convs; relu/relu6/sigmoid; avg/max pooling)      (:152-352)
  -> 1-channel pressure head                          (:364)
  -> U = velocityUpdate(p, UDiv, flags)               (:380)
  -> un-scale p, U by s; setWallBcs(U)                (:384-390)

Compute dtype: physics stays float32; the conv trunk runs in bfloat16 on
the MXU (mconf.conv_compute_dtype, 3.3x measured at 128^3; f32 available
for bit-strict comparisons).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import flags_to_occupancy
from fluidnet_tpu.ops.boundary import set_wall_bcs
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.ops.velocity_update import velocity_update


# -----------------------------------------------------------------------------
# Layer tables (model.lua:160-239).
# -----------------------------------------------------------------------------

def layer_spec(mconf: ModelConfig):
    """Per-stage (osize, ksize, psize, usize) just like the reference's
    tables; rank/gating default to full-rank ungated (the reference's
    defaults for every built-in model type)."""
    t = mconf.model_type
    if not mconf.is_3d:
        if t == "tog":
            osize = (16, 32, 32, 64, 64, 32, 1)
            ksize = (5, 5, 5, 5, 1, 1, 3)
            psize = (2, 1, 1, 1, 1, 1, 1)
            usize = (1, 1, 1, 1, 1, 1, 2)
        elif t == "default":
            osize = (16, 16, 16, 16, 1)
            ksize = (3, 3, 3, 3, 1)
            psize = (1, 1, 1, 1, 1)
            usize = (1, 1, 1, 1, 1)
        elif t == "yang":
            _check_yang(mconf)
            osize = (6, 6, 6, 1)
            ksize = (3, 1, 1, 1)
            psize = (1, 1, 1, 1)
            usize = (1, 1, 1, 1)
        else:
            raise ValueError(f"bad 2-D modelType {t}")
    else:
        if t == "tog":
            osize = (16, 16, 16, 16, 32, 32, 1)
            ksize = (3, 3, 3, 3, 1, 1, 3)
            psize = (2, 2, 1, 1, 1, 1, 1)
            usize = (1, 1, 1, 1, 1, 2, 2)
        elif t == "default":
            osize = (8, 8, 8, 8, 1)
            ksize = (3, 3, 3, 1, 1)
            psize = (1, 1, 1, 1, 1)
            usize = (1, 1, 1, 1, 1)
        elif t == "yang":
            _check_yang(mconf)
            osize = (6, 6, 6, 1)
            ksize = (3, 1, 1, 1)
            psize = (1, 1, 1, 1)
            usize = (1, 1, 1, 1)
        else:
            raise ValueError(f"bad 3-D modelType {t}")
    return osize, ksize, psize, usize


def _check_yang(mconf):
    """torch.checkYangSettings (model_utils.lua:211-227)."""
    ic = mconf.input_channels
    if mconf.nonlin_type != "sigmoid" or not ic.p_div or not ic.div or \
            ic.u_div or not ic.flags:
        raise ValueError("yang model needs sigmoid nonlinearity and "
                         "pDiv+div+flags (no UDiv) inputs")


def num_input_channels(mconf: ModelConfig) -> int:
    ic = mconf.input_channels
    n = 0
    if ic.p_div:
        n += 1
    if ic.u_div:
        n += 3 if mconf.is_3d else 2
    if not ic.flags:
        raise ValueError("flags input is required (model.lua:39-42)")
    n += 1  # occupancy
    if ic.div:
        n += 1
    return n


# -----------------------------------------------------------------------------
# Conv primitives.
# -----------------------------------------------------------------------------

def _conv_dims(nd):
    if nd == 2:
        return ("NCHW", "OIHW", "NCHW")
    return ("NCDHW", "OIDHW", "NCDHW")


def _init_conv(key, in_c, out_c, ks, nd):
    """Torch default conv init: U(-s, s), s = 1/sqrt(fan_in)."""
    if isinstance(ks, int):
        ks = (ks,) * nd
    fan_in = in_c * math.prod(ks)
    s = 1.0 / math.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    w = jax.random.uniform(wk, (out_c, in_c) + ks, jnp.float32, -s, s)
    b = jax.random.uniform(bk, (out_c,), jnp.float32, -s, s)
    return {"w": w, "b": b}


def _conv(x, p, nd, dilation=1, compute_dtype=jnp.bfloat16):
    """SAME-padded stride-1 conv.

    compute_dtype=bfloat16 casts both operands onto the MXU's fast path
    (measured 3.3x vs float32 at 128^3 on this chip — Precision.DEFAULT on
    f32 operands does NOT engage it here); the conv produces bf16 (f32
    accumulation inside the MXU) and is upcast at the bias add. Autodiff
    stays dtype-consistent because the cotangent flows back through the
    upcast, so the transposed convs see uniform bf16.

    3-D convs with a z-extent kernel run as ONE channels-last 2-D conv
    over a (B*Z) batch whose output channels are the (kz, out_c) pairs,
    followed by a z-shift-add reduction ("z-fold"): a (z,y,x) k3^3 conv
    with out_c=8 uses 8 of the MXU's 128 output lanes; folding the kz taps
    into the output dimension triples the useful width at identical FLOPs
    (measured: 8->8 k3^3 at 128^3 is 6.2 ms as a direct 3-D conv, 3x1.42
    ms as kz shifted 2-D convs, 1.5 ms as the z-fold NHWC conv — the chip
    sustains 171 TFLOP/s on square bf16 matmuls, so small-out_c convs are
    MXU-width-bound, not FLOP-bound). Numerically identical up to
    summation order."""
    w = p["w"]
    ks = w.shape[2:]
    dil = (dilation,) * nd
    bias = p["b"].reshape((1, -1) + (1,) * nd)
    if nd == 3 and ks[0] > 1:
        kz, ky, kx = ks
        out_c = w.shape[0]
        zpad = (kz - 1) // 2 * dilation
        b, c, Z, Y, X = x.shape
        xl = x.astype(compute_dtype).transpose(0, 2, 3, 4, 1) \
            .reshape(b * Z, Y, X, c)
        # (O, I, kz, ky, kx) -> (ky, kx, I, kz*O): out channel = iz*O + o.
        wl = w.astype(compute_dtype).transpose(3, 4, 1, 2, 0) \
            .reshape(ky, kx, c, kz * out_c)
        pad2 = tuple(((k - 1) // 2 * dilation,) * 2 for k in (ky, kx))
        y = jax.lax.conv_general_dilated(
            xl, wl, window_strides=(1, 1), padding=pad2,
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # out[z, o] = sum_iz y[z + iz*dil - zpad, iz, o].
        y = y.reshape(b, Z, Y, X, kz, out_c)
        yp = jnp.pad(y, ((0, 0), (zpad, zpad)) + ((0, 0),) * 4)
        acc = None
        for iz in range(kz):
            part = jax.lax.slice_in_dim(yp, iz * dilation,
                                        iz * dilation + Z, 1,
                                        axis=1)[..., iz, :]
            acc = part if acc is None else acc + part
        out = acc.transpose(0, 4, 1, 2, 3)
        return out.astype(jnp.float32) + bias
    pad = tuple(((k - 1) // 2 * d,) * 2 for k, d in zip(ks, dil))
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype),
        window_strides=(1,) * nd, padding=pad, rhs_dilation=dil,
        dimension_numbers=_conv_dims(nd))
    return out.astype(jnp.float32) + p["b"].reshape((1, -1) + (1,) * nd)


def _trunk_fold_zy() -> bool:
    """Experimental knob: fold ky AND kz into the conv's output channels
    (ky*kz*out_c MXU lanes instead of kz*out_c — 72/128 vs 24/128 for
    the default k3^3 8-channel stages) at the price of a 3x-wider fold
    intermediate (more HBM traffic in the shift-add). Worth it only if
    the trunk is MXU-lane-bound rather than HBM-bound; measured via
    scripts/perf_quick.py with FLUIDNET_TRUNK_FOLD=zy."""
    import os as _os
    return _os.environ.get("FLUIDNET_TRUNK_FOLD", "z") == "zy"


def _conv_nhwc(h, p, b, Z, dilation=1, compute_dtype=jnp.bfloat16):
    """One conv on a channels-last (b*Z, Y, X, c) slab batch (z-fold form
    for kz > 1, plain 2-D NHWC otherwise); stays in compute_dtype."""
    w = p["w"]
    out_c, in_c = w.shape[:2]
    kz, ky, kx = w.shape[2:]
    if kz > 1 and ky > 1 and _trunk_fold_zy():
        return _conv_nhwc_zy(h, p, b, Z, dilation, compute_dtype)
    wl = w.astype(compute_dtype).transpose(3, 4, 1, 2, 0) \
        .reshape(ky, kx, in_c, kz * out_c)
    pad2 = tuple(((k - 1) // 2 * dilation,) * 2 for k in (ky, kx))
    y = jax.lax.conv_general_dilated(
        h, wl, window_strides=(1, 1), padding=pad2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if kz > 1:
        zpad = (kz - 1) // 2 * dilation
        Y, X = y.shape[1:3]
        y = y.reshape(b, Z, Y, X, kz, out_c)
        yp = jnp.pad(y, ((0, 0), (zpad, zpad)) + ((0, 0),) * 4)
        acc = None
        for iz in range(kz):
            part = jax.lax.slice_in_dim(yp, iz * dilation,
                                        iz * dilation + Z, 1,
                                        axis=1)[..., iz, :]
            acc = part if acc is None else acc + part
        y = acc.reshape(b * Z, Y, X, out_c)
    return y + p["b"].astype(compute_dtype)


def _conv_nhwc_zy(h, p, b, Z, dilation, compute_dtype):
    """zy-fold variant of _conv_nhwc: the conv keeps only the kx spatial
    extent; (ky, kz) tap pairs become output channels, reduced by a
    y-shift-add then a z-shift-add. Identical math to _conv_nhwc up to
    summation order."""
    w = p["w"]
    out_c, in_c = w.shape[:2]
    kz, ky, kx = w.shape[2:]
    # (O, I, kz, ky, kx) -> (1, kx, I, ky*kz*O): out ch = (iy*kz + iz)*O + o
    wl = w.astype(compute_dtype).transpose(4, 1, 3, 2, 0) \
        .reshape(1, kx, in_c, ky * kz * out_c)
    padx = (kx - 1) // 2 * dilation
    y = jax.lax.conv_general_dilated(
        h, wl, window_strides=(1, 1), padding=((0, 0), (padx, padx)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    Yd, X = y.shape[1:3]
    ypad = (ky - 1) // 2 * dilation
    # y-fold on the slab batch: out[y] = sum_iy y[y + iy*dil - ypad, iy].
    y = y.reshape(b * Z, Yd, X, ky, kz * out_c)
    yp = jnp.pad(y, ((0, 0), (ypad, ypad), (0, 0), (0, 0), (0, 0)))
    acc = None
    for iy in range(ky):
        part = jax.lax.slice_in_dim(yp, iy * dilation, iy * dilation + Yd,
                                    1, axis=1)[..., iy, :]
        acc = part if acc is None else acc + part
    # z-fold: identical to _conv_nhwc's.
    zpad = (kz - 1) // 2 * dilation
    y = acc.reshape(b, Z, Yd, X, kz, out_c)
    yp = jnp.pad(y, ((0, 0), (zpad, zpad)) + ((0, 0),) * 4)
    acc = None
    for iz in range(kz):
        part = jax.lax.slice_in_dim(yp, iz * dilation, iz * dilation + Z,
                                    1, axis=1)[..., iz, :]
        acc = part if acc is None else acc + part
    y = acc.reshape(b * Z, Yd, X, out_c)
    return y + p["b"].astype(compute_dtype)


def _trunk_fast_ok(mconf, params, osize, psize, usize):
    """The channels-last fused-trunk preconditions: the default/yang 3-D
    models (no banks/pool/bn/upsample/gate/low-rank/pressure-skip)."""
    return (mconf.is_3d and mconf.banks_num == 1
            and not mconf.add_batch_norm and not mconf.add_pressure_skip
            and all(ps == 1 for ps in psize)
            and all(us == 1 for us in usize)
            and all("conv" in st[0] and "gate" not in st[0]
                    for st in params["stages"])
            and "conv" in params["final"] and "gate" not in params["final"])


def _trunk_nhwc(params, mconf, x, compute_dtype):
    """Whole conv trunk channels-last in compute dtype: one transpose in,
    one out — removes the per-layer NCDHW<->NHWC transposes and f32
    round-trips of the generic stage path (measured ~2x at 128^3)."""
    b, c, Z, Y, X = x.shape
    h = x.astype(compute_dtype).transpose(0, 2, 3, 4, 1) \
        .reshape(b * Z, Y, X, c)
    for stage in params["stages"]:
        h = _conv_nhwc(h, stage[0]["conv"], b, Z,
                       compute_dtype=compute_dtype)
        h = _nonlin(h, mconf.nonlin_type)
    h = _conv_nhwc(h, params["final"]["conv"], b, Z,
                   compute_dtype=compute_dtype)
    out = h.reshape(b, Z, Y, X, -1).transpose(0, 4, 1, 2, 3)
    return out.astype(jnp.float32)


def _pixel_shuffle(x, up, nd):
    """Interleave (out*up^nd) channels into space, the TPU-native form of
    nn.SpatialConvolutionUpsample / VolumetricConvolutionUpsample
    (lib/modules/spatial_convolution_upsample.lua:47-82)."""
    if nd == 2:
        b, c, h, w = x.shape
        oc = c // (up * up)
        x = x.reshape(b, oc, up, up, h, w)
        x = x.transpose(0, 1, 4, 2, 5, 3)        # b, oc, h, sH, w, sW
        return x.reshape(b, oc, h * up, w * up)
    b, c, d, h, w = x.shape
    oc = c // (up ** 3)
    x = x.reshape(b, oc, up, up, up, d, h, w)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)      # b, oc, d,sD, h,sH, w,sW
    return x.reshape(b, oc, d * up, h * up, w * up)


def _pool(x, size, nd, kind):
    dims = (1, 1) + (size,) * nd
    if kind == "avg":
        out = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, dims, "VALID")
        return out / float(size ** nd)
    if kind == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, dims,
                                     "VALID")
    raise ValueError(kind)


def _nearest_upsample(x, ratio, nd):
    """SpatialUpSamplingNearest / tfluids.VolumetricUpSamplingNearest
    (torch/tfluids/volumetric_up_sampling_nearest.lua)."""
    for ax in range(x.ndim - nd, x.ndim):
        x = jnp.repeat(x, ratio, axis=ax)
    return x


def _nonlin(x, kind):
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "relu6":
        return jnp.minimum(jax.nn.relu(x), 6.0)
    if kind == "sigmoid":
        return jax.nn.sigmoid(x)
    raise ValueError(kind)


# -----------------------------------------------------------------------------
# Stage construction: full-rank / low-rank / upsampling / dilated / gated.
# (model_utils.lua:64-182)
# -----------------------------------------------------------------------------

def _init_stage(key, mconf, in_c, out_c, k, up, nd, rank=None,
                inter_feats=None, gated=False):
    if rank is None:
        rank = nd  # full rank default (model_utils.lua:154-161)
    keys = jax.random.split(key, 8)
    # The stage kind is implied by structure ('conv' vs 'convs' + the static
    # `up` passed to _apply_stage), keeping the params pytree string-free.
    p = {}
    if up > 1:
        assert rank == nd, "upsampling layers must be full rank"
        p["conv"] = _init_conv(keys[0], in_c, out_c * up ** nd, k, nd)
    elif rank == nd:
        p["conv"] = _init_conv(keys[0], in_c, out_c, k, nd)
    else:
        # Low-rank separable factorization (model_utils.lua:78-120).
        assert inter_feats is not None
        if nd == 2:  # rank 1: (k,1) then (1,k)
            p["convs"] = [
                _init_conv(keys[0], in_c, inter_feats, (1, k), 2),
                _init_conv(keys[1], inter_feats, out_c, (k, 1), 2),
            ]
        else:
            if rank == 1:
                p["convs"] = [
                    _init_conv(keys[0], in_c, inter_feats, (1, 1, k), 3),
                    _init_conv(keys[1], inter_feats, inter_feats, (1, k, 1), 3),
                    _init_conv(keys[2], inter_feats, out_c, (k, 1, 1), 3),
                ]
            else:  # rank 2
                p["convs"] = [
                    _init_conv(keys[0], in_c, inter_feats, (1, k, k), 3),
                    _init_conv(keys[1], inter_feats, out_c, (k, k, 1), 3),
                ]
    if gated:
        p["gate"] = _init_conv(keys[3], in_c,
                               out_c * (up ** nd if up > 1 else 1), k, nd)
    return p


def _apply_stage(p, x, nd, up=1, dilation=1, compute_dtype=jnp.bfloat16):
    if up > 1:
        out = _conv(x, p["conv"], nd, compute_dtype=compute_dtype)
        if "gate" in p:
            out = out * _conv(x, p["gate"], nd, compute_dtype=compute_dtype)
        return _pixel_shuffle(out, up, nd)
    if "conv" in p:
        out = _conv(x, p["conv"], nd, dilation, compute_dtype=compute_dtype)
    else:
        out = x
        for cp in p["convs"]:
            out = _conv(out, cp, nd, dilation, compute_dtype=compute_dtype)
    if "gate" in p:
        out = out * _conv(x, p["gate"], nd, dilation,
                          compute_dtype=compute_dtype)
    return out


def _init_bn(out_c):
    return {"scale": jnp.ones((out_c,)), "bias": jnp.zeros((out_c,)),
            "mean": jnp.zeros((out_c,)), "var": jnp.ones((out_c,))}


def _apply_bn(p, x, nd, eps, affine, training):
    axes = (0,) + tuple(range(2, 2 + nd))
    if training:
        mean = jnp.mean(x, axes)
        var = jnp.var(x, axes)
    else:
        mean, var = p["mean"], p["var"]
    shape = (1, -1) + (1,) * nd
    out = (x - mean.reshape(shape)) * jax.lax.rsqrt(
        var.reshape(shape) + eps)
    if affine:
        out = out * p["scale"].reshape(shape) + p["bias"].reshape(shape)
    return out


# -----------------------------------------------------------------------------
# Model init / apply.
# -----------------------------------------------------------------------------

def init_model(key, mconf: ModelConfig):
    """Builds the params pytree for defineModelGraph (model.lua:27-401)."""
    osize, ksize, psize, usize = layer_spec(mconf)
    n_stage = len(osize)
    nd = 3 if mconf.is_3d else 2
    assert osize[-1] == 1 and psize[-1] == 1
    assert mconf.banks_num >= 1
    if mconf.banks_num > 1:
        assert mconf.banks_split_stage < mconf.banks_join_stage
        assert 1 <= mconf.banks_split_stage < n_stage
        assert 1 <= mconf.banks_join_stage < n_stage

    in_c = num_input_channels(mconf)
    params = {"stages": [], "bn": []}
    keys = jax.random.split(key, n_stage + 1)
    n_banks_now = 1
    for lid in range(n_stage - 1):   # lua stages 1..#osize-1
        if mconf.banks_num > 1 and lid + 1 == mconf.banks_split_stage:
            n_banks_now = mconf.banks_num
        if mconf.banks_num > 1 and lid + 1 == mconf.banks_join_stage:
            if mconf.banks_aggregate_method == "concat":
                in_c = in_c * mconf.banks_num
            n_banks_now = 1
        bank_keys = jax.random.split(keys[lid], max(n_banks_now, 1))
        if mconf.banks_weight_share:
            stage = [_init_stage(bank_keys[0], mconf, in_c, osize[lid],
                                 ksize[lid], usize[lid], nd)] * n_banks_now
        else:
            stage = [_init_stage(bank_keys[i], mconf, in_c, osize[lid],
                                 ksize[lid], usize[lid], nd)
                     for i in range(n_banks_now)]
        params["stages"].append(stage)
        params["bn"].append(_init_bn(osize[lid]) if mconf.add_batch_norm
                            else None)
        in_c = osize[lid]

    if mconf.add_pressure_skip:
        in_c += 1
    params["final"] = _init_stage(keys[-1], mconf, in_c, 1, ksize[-1],
                                  usize[-1], nd)
    return params


def _input_scale(mconf, p_div, u_div, div):
    """Per-sample normalization scale (model.lua:92-131): std (unbiased
    sample variance, lib/modules/variance.lua:16-17) or l2 norm of the
    chosen channel, clamped below."""
    chan = {"UDiv": u_div, "pDiv": p_div, "div": div}[
        mconf.normalize_input_chan]
    b = chan.shape[0]
    flat = chan.reshape(b, -1)
    thr = mconf.normalize_input_threshold
    # Inner where keeps sqrt away from 0: its infinite derivative would
    # poison full-rollout gradients (0 * inf = NaN) even though the
    # threshold clamp discards the value.
    if mconf.normalize_input_func == "std":
        n = flat.shape[1]
        mean = jnp.mean(flat, axis=1, keepdims=True)
        var = jnp.sum((flat - mean) ** 2, axis=1) / (n - 1)
        ok = var > thr * thr
        s = jnp.where(ok, jnp.sqrt(jnp.where(ok, var, 1.0)), thr)
    elif mconf.normalize_input_func == "norm":
        sq = jnp.sum(flat * flat, axis=1)
        ok = sq > thr * thr
        s = jnp.where(ok, jnp.sqrt(jnp.where(ok, sq, 1.0)), thr)
    else:
        raise ValueError(mconf.normalize_input_func)
    s = jnp.maximum(s, thr)
    return s.reshape(b, 1, 1, 1, 1)


def apply_model(params, mconf: ModelConfig, p_div, u_div, flags,
                training: bool = False, precomputed_div=None):
    """Forward pass; returns (p, U) like parseModelOutput (model.lua:445-450).

    All inputs (b, c, z, y, x); 2-D convs run on squeezed (b, c, y, x)
    (model.lua:152-155).

    `precomputed_div`: the fused projection prologue (ops.prologue)
    computes setWallBcs + divergence in-kernel; when provided, `u_div`
    is assumed already wall-bc'ed and both input ops are skipped."""
    osize, ksize, psize, usize = layer_spec(mconf)
    nd = 3 if mconf.is_3d else 2
    ic = mconf.input_channels
    cdt = jnp.bfloat16 if mconf.conv_compute_dtype == "bfloat16" \
        else jnp.float32

    if precomputed_div is None:
        u_div = set_wall_bcs(u_div, flags)
        div = velocity_divergence(u_div, flags) if ic.div else None
    else:
        div = precomputed_div if ic.div else None

    if mconf.normalize_input:
        s = _input_scale(mconf, p_div, u_div, div)
        p_div = p_div / s
        u_div = u_div / s
        if div is not None:
            div = div / s

    chans = []
    if ic.p_div:
        chans.append(p_div)
    if ic.u_div:
        chans.append(u_div)
    if ic.div:
        chans.append(div)
    chans.append(flags_to_occupancy(flags))
    x = jnp.concatenate(chans, axis=1)

    if not mconf.is_3d:
        x = x[:, :, 0]  # squeeze unary z (model.lua:154)

    if _trunk_fast_ok(mconf, params, osize, psize, usize):
        p = _trunk_nhwc(params, mconf, x, cdt)
        u = velocity_update(u_div, flags, p)
        if mconf.normalize_input:
            p = p * s
            u = u * s
        u = set_wall_bcs(u, flags)
        return p, u

    hl = [x]
    n_stage = len(osize)
    for lid in range(n_stage - 1):
        if mconf.banks_num > 1 and lid + 1 == mconf.banks_split_stage:
            if mconf.banks_type == "mres":
                for ib in range(1, mconf.banks_num):
                    hl.append(_pool(hl[ib - 1], 2, nd, "avg"))
            else:
                hl = [hl[0]] * mconf.banks_num
        if mconf.banks_num > 1 and lid + 1 == mconf.banks_join_stage:
            if mconf.banks_type == "mres":
                hl = [hl[0]] + [_nearest_upsample(h, 2 ** ib, nd)
                                for ib, h in enumerate(hl) if ib > 0]
            if mconf.banks_aggregate_method == "concat":
                hl = [jnp.concatenate(hl, axis=1)]
            elif mconf.banks_aggregate_method == "add":
                hl = [sum(hl)]
            else:
                raise ValueError(mconf.banks_aggregate_method)
        stage = params["stages"][lid]
        new_hl = []
        for ib, h in enumerate(hl):
            dilation = 2 ** ib if mconf.banks_type == "dilate" else 1
            out = _apply_stage(stage[ib], h, nd, usize[lid], dilation,
                               compute_dtype=cdt)
            out = _nonlin(out, mconf.nonlin_type)
            if psize[lid] > 1:
                out = _pool(out, psize[lid], nd, mconf.pool_type)
            if mconf.add_batch_norm:
                out = _apply_bn(params["bn"][lid], out, nd,
                                mconf.batch_norm_eps,
                                mconf.batch_norm_affine, training)
            new_hl.append(out)
        hl = new_hl

    assert len(hl) == 1, "banks must be joined before the final stage"
    h = hl[0]
    if mconf.add_pressure_skip:
        skip = p_div if mconf.is_3d else p_div[:, :, 0]
        h = jnp.concatenate([h, skip], axis=1)

    p = _apply_stage(params["final"], h, nd, usize[-1], compute_dtype=cdt)
    if not mconf.is_3d:
        p = p[:, :, None]  # unsqueeze z (model.lua:368)

    u = velocity_update(u_div, flags, p)

    if mconf.normalize_input:
        p = p * s
        u = u * s

    u = set_wall_bcs(u, flags)
    return p, u


def make_model_fn(mconf: ModelConfig):
    """Adapter matching the simulate() model_fn signature."""
    def model_fn(params, p, u, flags, **kw):
        return apply_model(params, mconf, p, u, flags, **kw)
    return model_fn
