"""Functional layer primitives: pure functions over parameter pytrees.

Design: no module framework — every layer is ``apply(params, x, ...)`` with a
matching ``init(key, ...)``. Parameters are nested dicts of jnp arrays, which
makes them directly shardable with NamedSharding, trivially mappable from
safetensors checkpoints, and free of any host-side object graph inside jit.

Layout conventions (TPU-first, deviating from the reference's NCHW torch):
- activations NHWC (channels on the minor/lane dimension)
- conv kernels HWIO
- linear kernels [in, out]

Numerics: matmuls/convs run in the policy compute dtype (bf16 by default)
with fp32 accumulation; normalization statistics and softmax are fp32.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def _fan_in_init(key, shape, fan_in, dtype):
    """Kaiming-uniform, matching torch's default conv/linear init scale."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv_init(key, kh, kw, cin, cout, dtype=jnp.float32, use_bias=True):
    kk, kb = jax.random.split(key)
    fan_in = kh * kw * cin
    p = {"kernel": _fan_in_init(kk, (kh, kw, cin, cout), fan_in, dtype)}
    if use_bias:
        p["bias"] = _fan_in_init(kb, (cout,), fan_in, dtype)
    return p


def linear_init(key, cin, cout, dtype=jnp.float32, use_bias=True):
    kk, kb = jax.random.split(key)
    p = {"kernel": _fan_in_init(kk, (cin, cout), cin, dtype)}
    if use_bias:
        p["bias"] = _fan_in_init(kb, (cout,), cin, dtype)
    return p


def norm_init(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def conv2d(params, x, stride=1, padding=1):
    """3x3/1x1/strided conv, NHWC x HWIO.

    ``padding`` is an int (symmetric) or an explicit ((t,b),(l,r)) pair.
    """
    if isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    else:
        pad = padding
    kernel = params["kernel"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def linear(params, x):
    y = jnp.dot(x, params["kernel"].astype(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def group_norm(params, x, num_groups=32, eps=1e-6):
    """GroupNorm over the channel (minor) dim of NHWC / [..., C] input.

    TPU-layout-aware: statistics are computed as per-channel moments (a
    spatial reduction in the native [N,H,W,C] layout) followed by a tiny
    [N,C]→[N,G] group reduction — never reshaping the feature map to
    [..., G, C/G], whose C/G minor dimension would force a padded relayout
    of the whole activation on every norm. fp32 statistics; channel grouping
    matches torch's contiguous blocks.
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    n = x.shape[0]
    g = min(num_groups, c)
    cg = c // g
    xf = x.astype(jnp.float32)
    spatial_axes = tuple(range(1, x.ndim - 1))
    # per-channel moments (equal spatial counts per channel)
    mean_c = jnp.mean(xf, axis=spatial_axes)  # [N, C]
    m2_c = jnp.mean(jnp.square(xf), axis=spatial_axes)  # [N, C]
    # tiny group reduction + broadcast back to channels
    mean_g = jnp.mean(mean_c.reshape(n, g, cg), axis=-1)  # [N, G]
    m2_g = jnp.mean(m2_c.reshape(n, g, cg), axis=-1)
    var_g = jnp.maximum(m2_g - jnp.square(mean_g), 0.0)
    mean = jnp.repeat(mean_g, cg, axis=-1)  # [N, C]
    inv = jnp.repeat(jax.lax.rsqrt(var_g + eps), cg, axis=-1)  # [N, C]
    shape = (n,) + (1,) * (x.ndim - 2) + (c,)
    scale = (inv * params["scale"].astype(jnp.float32)).reshape(shape)
    shift = (
        params["bias"].astype(jnp.float32) - mean * inv * params["scale"].astype(jnp.float32)
    ).reshape(shape)
    return (xf * scale + shift).astype(orig_dtype)


def layer_norm(params, x, eps=1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def silu(x):
    return jax.nn.silu(x)


def _small_kv_attention(q, k, v, num_heads):
    """Attention for tiny KV lengths (the 2-token empty-prompt context).

    A [S, 2]-shaped logits tensor puts 2 elements on the 128-lane minor
    dimension — a 64× padded layout that costs more bandwidth than the whole
    matmul. Instead unroll over KV tokens: logits become [N, S, H] arrays
    (well-laid-out) and the output is a weighted sum of per-token outer
    products. Numerically identical to softmax attention.
    """
    n, sq, c = q.shape
    sk = k.shape[1]
    hd = c // num_heads
    scale = 1.0 / math.sqrt(hd)
    qh = q.reshape(n, sq, num_heads, hd)
    kh = k.reshape(n, sk, num_heads, hd)
    vh = v.reshape(n, sk, num_heads, hd)
    # per-token logits [N, H, S] in fp32 — S on the minor (lane) dim; a
    # [N, S, H] layout would pad H (e.g. 5 heads) to 128 lanes.
    logits = [
        jnp.einsum(
            "nshd,nhd->nhs", qh, kh[:, j], preferred_element_type=jnp.float32
        )
        * scale
        for j in range(sk)
    ]
    m = logits[0]
    for term in logits[1:]:
        m = jnp.maximum(m, term)
    exps = [jnp.exp(term - m) for term in logits]
    denom = sum(exps)
    out = None
    for j in range(sk):
        w = (exps[j] / denom).astype(q.dtype)  # [N, H, S]
        term = jnp.einsum("nhs,nhd->nshd", w, vh[:, j])
        out = term if out is None else out + term
    return out.reshape(n, sq, c)


def attention(q, k, v, num_heads):
    """Multi-head scaled dot-product attention over [N, S, C] tensors.

    fp32 softmax; bf16 matmuls accumulate fp32 on the MXU via
    preferred_element_type. Replaced by a fused Pallas kernel on TPU for the
    UNet hot path (see ops/flash_attention.py); this is the reference/XLA
    fallback with identical semantics. KV lengths ≤ 4 route to an unrolled,
    layout-friendly path (cross-attention over the cached empty prompt).
    """
    n, sq, c = q.shape
    sk = k.shape[1]
    if sk <= 4 and c % num_heads == 0:
        return _small_kv_attention(q, k, v, num_heads)
    hd = c // num_heads
    qh = q.reshape(n, sq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(n, sk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(n, sk, num_heads, hd).transpose(0, 2, 1, 3)
    scale = 1.0 / math.sqrt(hd)
    logits = (
        jnp.einsum("nhqd,nhkd->nhqk", qh, kh, preferred_element_type=jnp.float32)
        * scale
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("nhqk,nhkd->nhqd", probs, vh, preferred_element_type=jnp.float32)
    out = out.astype(q.dtype).transpose(0, 2, 1, 3).reshape(n, sq, c)
    return out


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (SD convention: flip_sin_to_cos=True).

    timesteps: [N] (int or float) → [N, dim] float32.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def conv3x3_mean_tap(params, h):
    """Channel-mean of ``conv3x3_same(h, kernel) + bias`` as a tap matmul.

    Equals ``mean_co(conv2d(params, h))`` exactly (mean commutes with the
    conv:  mean_co(conv(h,W)+b) = conv(h, mean_co W) + mean_co b) but avoids
    emitting a C_out∈{1,3} conv, which does no useful MXU work — one output
    column runs at vector-unit speed and its transpose is a depth-1
    contraction (traced at 3.8 ms fwd + 3.2 ms bwd at 576×768, PERF.md).
    Instead: one [NHW,C]×[C,9] tap matmul (full-depth contraction; taps
    emitted leading-dim so each [H,W] map stays dense (8,128)-tiled) and
    nine shifted adds — pure bandwidth. Returns [N,H,W].
    """
    n, hh, ww, c = h.shape
    kbar = jnp.mean(params["kernel"].astype(jnp.float32), axis=-1)  # [3,3,C]
    kmat = kbar.reshape(9, c).astype(h.dtype)  # tap-major [9, C]
    m = jnp.einsum("nhwc,tc->tnhw", h, kmat)  # [9, N, H, W]
    mp = jnp.pad(m, ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = jnp.zeros((n, hh, ww), h.dtype)
    for t in range(9):
        dh, dw = divmod(t, 3)
        out = out + jax.lax.slice(
            mp, (t, 0, dh, dw), (t + 1, n, dh + hh, dw + ww)
        )[0]
    if "bias" in params:
        out = out + jnp.mean(params["bias"].astype(jnp.float32)).astype(h.dtype)
    return out


def conv3x3_mean_tap_packed(params, hp):
    """``conv3x3_mean_tap`` consuming the width-packed feature map directly.

    ``hp`` is the packed decoder output [N, H, W/2, 2C] (column pairs on the
    channel dim, models/vae_tiny.py). Unpacking it first costs a full-tensor
    relayout copy (the 128-channel → 64-channel reshape retiles; ~1.5 ms
    fwd + the same again in backward at 576×384×128, trace round-5), so the
    mean-tap head is evaluated in the packed domain instead: the actual
    3×3 column taps K0/K1/K2 become per-packed-column taps over (lo, hi)
    channel halves — lo output (actual col 2j) reads K0·hi[j-1] + K1·lo[j]
    + K2·hi[j]; hi output (2j+1) reads K0·lo[j] + K1·hi[j] + K2·lo[j+1] —
    giving one [NHW/2, 2C]×[2C, 18] tap matmul (full 128-deep contraction,
    vs 64 unpacked) and nine shifted adds. Exact same math, no relayout.
    Returns [N, H, W].
    """
    n, hh, w2, c2 = hp.shape
    c = c2 // 2
    kbar = jnp.mean(params["kernel"].astype(jnp.float32), axis=-1)  # [3,3,C]
    z = jnp.zeros((3, c), jnp.float32)
    k0, k1, k2 = kbar[:, 0], kbar[:, 1], kbar[:, 2]  # [3, C] each
    # kp[dh, dwp, 2C, p]: p=0 → lo output (actual col 2j), p=1 → hi (2j+1)
    lo_taps = jnp.stack(
        [
            jnp.concatenate([z, k0], axis=-1),   # packed col j-1: K0·hi
            jnp.concatenate([k1, k2], axis=-1),  # packed col j:   K1·lo+K2·hi
            jnp.concatenate([z, z], axis=-1),    # packed col j+1: —
        ],
        axis=1,
    )  # [3, 3, 2C]
    hi_taps = jnp.stack(
        [
            jnp.concatenate([z, z], axis=-1),    # packed col j-1: —
            jnp.concatenate([k0, k1], axis=-1),  # packed col j:   K0·lo+K1·hi
            jnp.concatenate([k2, z], axis=-1),   # packed col j+1: K2·lo
        ],
        axis=1,
    )
    kp = jnp.stack([lo_taps, hi_taps], axis=-1)  # [3, 3, 2C, 2]
    kmat = kp.reshape(9, c2, 2).astype(hp.dtype)
    # p rides a major dim ("pnhw") — a 2-wide minor dim would pad 64× on the
    # 128-lane axis; each [H, W/2] map stays dense (8,128)-tiled instead.
    m = jnp.einsum("nhwc,tcp->tpnhw", hp, kmat)  # [9, 2, N, H, W/2]
    mp = jnp.pad(m, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))
    out = jnp.zeros((2, n, hh, w2), hp.dtype)
    for t in range(9):
        dh, dw = divmod(t, 3)
        out = out + jax.lax.slice(
            mp, (t, 0, 0, dh, dw), (t + 1, 2, n, dh + hh, dw + w2)
        )[0]
    if "bias" in params:
        out = out + jnp.mean(params["bias"].astype(jnp.float32)).astype(hp.dtype)
    # interleave lo/hi columns back to actual width (tiny: [N,H,W/2,2] is
    # the final 1-channel map, not the 128-channel feature tensor)
    return jnp.moveaxis(out, 0, -1).reshape(n, hh, w2 * 2)


def upsample_nearest_2x(x):
    """NHWC nearest-neighbor 2x upsample."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def upsample_conv_2x_matmul(params, x):
    """``conv2d(params, upsample_nearest_2x(x))`` exactly, computed on the
    ORIGINAL grid as four subpixel 2x2-tap dot_generals.

    Under nearest-2x, output subpixel (di,dj) of upsample-then-3x3-conv only
    sees a 2x2 source neighborhood with row/col-summed kernel slices
    (subpixel 0 per axis: offsets (-1,0) with kernel rows (0, 1+2);
    subpixel 1: offsets (0,+1) with rows (0+1, 2)) — 2.25x fewer MACs.
    Expressed as dot_general over a 4C contraction so XLA cannot rewrite it
    back into its slow fused-broadcast conv (PERF.md round 2: that path runs
    at ~32 TF/s in-graph; barriers and MSA flags were all neutral).
    """
    n, h, w, c = x.shape
    k = params["kernel"].astype(x.dtype)  # [3,3,C,Co]
    co = k.shape[-1]

    a0 = jnp.stack([k[0], k[1] + k[2]])  # [2,3,C,Co] row taps for di=0
    a1 = jnp.stack([k[0] + k[1], k[2]])  # [2,3,C,Co] row taps for di=1

    def col_collapse(a, dj):
        if dj == 0:
            return jnp.stack([a[:, 0], a[:, 1] + a[:, 2]], axis=1)  # [2,2,C,Co]
        return jnp.stack([a[:, 0] + a[:, 1], a[:, 2]], axis=1)

    def shift(ri, rj):  # zero-padded shifted view of x
        pt, pb = max(-ri, 0), max(ri, 0)
        pl, pr = max(-rj, 0), max(rj, 0)
        y = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        return y[:, pb : pb + h, pr : pr + w, :]

    offs = {0: (-1, 0), 1: (0, 1)}
    outs = []
    for di in (0, 1):
        rows = a0 if di == 0 else a1
        for dj in (0, 1):
            kk = col_collapse(rows, dj)  # [2,2,C,Co], (a, b, C) flattening
            xin = jnp.concatenate(
                [shift(offs[di][a], offs[dj][b]) for a in (0, 1) for b in (0, 1)],
                axis=-1,
            )
            outs.append(
                jax.lax.dot_general(
                    xin.reshape(n * h * w, 4 * c),
                    kk.reshape(4 * c, co),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=x.dtype,
                ).reshape(n, h, w, co)
            )
    o = jnp.stack(outs, axis=3).reshape(n, h, w, 2, 2, co)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, co)
    if "bias" in params:
        o = o + params["bias"].astype(o.dtype)
    return o

