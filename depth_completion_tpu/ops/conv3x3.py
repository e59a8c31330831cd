"""Fused 3×3 conv Pallas kernel for the packed TAESD decoder stages.

Why this exists: the guidance gradient flows through the TAESD decoder every
DDIM step (reference marigold_dc.py:828-840), so decode fwd+bwd is ~17% of
the step. XLA lowers each 3×3 conv by materializing im2col patch tensors in
HBM (trace: kOutput "formatting" fusions + relayout copies around every
conv, PERF.md round-2 tail anatomy), which triples HBM traffic and leaves
the width-packed decode at ~2.5× its roofline. This kernel streams H-tiles
through VMEM instead: one DMA per input tile (+1 halo row each side), nine
shifted [tile, C]×[C, C] MXU dots accumulated in fp32, and the bias / skip /
ReLU epilogue fused into the same kernel — no patch tensors, no relayout
copies, no separate elementwise passes over the 56 MB stage-4 feature map.

Layout contract: NHWC with C a multiple of 128 (the width-packed decode
puts pairs of columns on the 128-lane minor dim, models/vae_tiny.py), W a
multiple of 8 (sublanes), stride 1, SAME zero padding — exactly the packed
decoder's conv shape. The custom VJP computes dx with the same kernel on
flip-transposed taps (input-grad of a stride-1 SAME conv is itself such a
conv); dk/db/dskip use plain XLA forms that get dead-code-eliminated in the
sampler, which differentiates w.r.t. latents only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8

# Test hook: run the kernel in the Pallas interpreter (CPU) instead of Mosaic.
INTERPRET = False


def _pick_block_h(h: int, w: int, c: int, itemsize: int) -> int | None:
    """Largest divisor of H with an input tile ≤ 768 KB, capped at 64 rows.

    The 16 MB scoped-VMEM budget must hold the double-buffered input/skip/
    output tiles, the fp32 accumulator, the tap matrix, and shift
    temporaries — a ≤768 KB input tile keeps the total ≈ 8–10 MB.
    """
    best = None
    for hb in range(1, min(h, 64) + 1):
        if h % hb == 0 and hb * w * c * itemsize <= 786_432:
            best = hb
    return best


def enabled() -> bool:
    """Use the fused kernel for supported convs?

    ``DCT_CONV_KERNEL`` ∈ {auto (default), on, off}; "auto" enables it on the
    TPU backend (and under the Pallas interpreter test hook).
    """
    import os

    mode = os.environ.get("DCT_CONV_KERNEL", "auto")
    if mode == "off":
        return False
    if mode == "on":
        return True
    return INTERPRET or jax.default_backend() == "tpu"


def supported(x: jnp.ndarray) -> bool:
    """Whether ``x`` fits this kernel's layout contract."""
    if x.ndim != 4:
        return False
    _, h, w, c = x.shape
    return (
        c % _LANES == 0
        and w % _SUBLANES == 0
        and _pick_block_h(h, w, c, x.dtype.itemsize) is not None
    )


def _conv_kernel(
    x_ref, top_ref, bot_ref, k_ref, b_ref, skip_ref,
    m_ref, mtop_ref, mbot_ref, o_ref, mo_ref, *, relu, n_hblocks
):
    i = pl.program_id(1)
    hb, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    co = k_ref.shape[3]
    x = x_ref[0]

    # Input-side ReLU mask (backward fusion): x ← where(m > 0, x, 0) applied
    # tile-wise as the operand streams through VMEM, instead of a standalone
    # full-tensor compare/select round trip in HBM (trace: three ~2 ms
    # compare_select_fusions per decode block at bench geometry).
    # (compares run in fp32: Mosaic cannot lower cmpf on packed bf16 vectors)
    if m_ref is not None:
        x = jnp.where(m_ref[0].astype(jnp.float32) > 0, x, jnp.zeros_like(x))
    if mo_ref is not None:
        mo_ref[0] = x  # masked operand, for consumers outside (dskip/dk/db)

    # Halo rows (clamped index maps fetch row 0 / H-1 at the edges; the real
    # SAME-conv boundary is zero padding, so mask them off there).
    top = jnp.where(i == 0, jnp.zeros_like(top_ref[0]), top_ref[0])
    bot = jnp.where(i == n_hblocks - 1, jnp.zeros_like(bot_ref[0]), bot_ref[0])
    if m_ref is not None:
        top = jnp.where(
            mtop_ref[0].astype(jnp.float32) > 0, top, jnp.zeros_like(top)
        )
        bot = jnp.where(
            mbot_ref[0].astype(jnp.float32) > 0, bot, jnp.zeros_like(bot)
        )
    rows = jnp.concatenate([top, x, bot], axis=0)  # [hb+2, w, c]

    zcol = jnp.zeros((hb, 1, c), x.dtype)
    acc = jnp.zeros((hb * w, co), jnp.float32)
    for dh in range(3):
        xr = jax.lax.slice_in_dim(rows, dh, dh + hb, axis=0)  # [hb, w, c]
        for dw in range(3):
            if dw == 0:
                xs = jnp.concatenate([zcol, xr[:, : w - 1]], axis=1)
            elif dw == 2:
                xs = jnp.concatenate([xr[:, 1:], zcol], axis=1)
            else:
                xs = xr
            acc += jax.lax.dot(
                xs.reshape(hb * w, c),
                k_ref[dh, dw],
                preferred_element_type=jnp.float32,
            )
    y = acc.reshape(hb, w, co)
    if b_ref is not None:
        y = y + b_ref[...].astype(jnp.float32)
    if skip_ref is not None:
        y = y + skip_ref[0].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _conv_call(x, kernel, bias, skip, relu, mask=None, emit_masked=False):
    """The Pallas call. ``mask`` (same shape as ``x``) zeroes the operand
    where ``mask <= 0`` as it streams in — the backward ReLU-mask fusion.
    ``emit_masked`` additionally returns the masked operand as a second
    output (for dskip/dk/db consumers when the masked tensor stays live)."""
    n, h, w, c = x.shape
    co = kernel.shape[3]
    hb = _pick_block_h(h, w, c, x.dtype.itemsize)
    if hb is None:
        raise ValueError(f"conv3x3_fused: no H tiling for shape {x.shape}")
    nh = h // hb

    tile_spec = pl.BlockSpec((1, hb, w, c), lambda nn, ii: (nn, ii, 0, 0))
    # one-row halos: block_h = 1 ⇒ the index map addresses element rows
    top_spec = pl.BlockSpec(
        (1, 1, w, c), lambda nn, ii: (nn, jnp.maximum(ii * hb - 1, 0), 0, 0)
    )
    bot_spec = pl.BlockSpec(
        (1, 1, w, c),
        lambda nn, ii: (nn, jnp.minimum(ii * hb + hb, h - 1), 0, 0),
    )
    in_specs = [
        tile_spec, top_spec, bot_spec,
        pl.BlockSpec((3, 3, c, co), lambda nn, ii: (0, 0, 0, 0)),
    ]
    args = [x, x, x, kernel]
    if bias is not None:
        in_specs.append(pl.BlockSpec((co,), lambda nn, ii: (0,)))
        args.append(bias)
    if skip is not None:
        in_specs.append(pl.BlockSpec((1, hb, w, co), lambda nn, ii: (nn, ii, 0, 0)))
        args.append(skip)
    if mask is not None:
        in_specs.extend([tile_spec, top_spec, bot_spec])
        args.extend([mask, mask, mask])

    def kern(x_ref, top_ref, bot_ref, k_ref, *rest):
        b_ref = skip_ref = m_ref = mtop_ref = mbot_ref = mo_ref = None
        rest = list(rest)
        if emit_masked:
            mo_ref = rest.pop()
        o_ref = rest.pop()
        if bias is not None:
            b_ref = rest.pop(0)
        if skip is not None:
            skip_ref = rest.pop(0)
        if mask is not None:
            m_ref, mtop_ref, mbot_ref = rest
        _conv_kernel(
            x_ref, top_ref, bot_ref, k_ref, b_ref, skip_ref,
            m_ref, mtop_ref, mbot_ref, o_ref, mo_ref,
            relu=relu, n_hblocks=nh,
        )

    out_spec = pl.BlockSpec((1, hb, w, co), lambda nn, ii: (nn, ii, 0, 0))
    out_shape = jax.ShapeDtypeStruct((n, h, w, co), x.dtype)
    if emit_masked:
        out_specs = [out_spec, tile_spec]
        out_shapes = [out_shape, jax.ShapeDtypeStruct((n, h, w, c), x.dtype)]
    else:
        out_specs, out_shapes = out_spec, out_shape
    return pl.pallas_call(
        kern,
        grid=(n, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=INTERPRET,
    )(*args)


def _flip_transpose(kernel):
    """Input-grad taps: kf[dh,dw] = k[2-dh,2-dw]ᵀ."""
    return jnp.transpose(jnp.flip(kernel, (0, 1)), (0, 1, 3, 2))


def _weight_grad(x, dy):
    """dW[dh,dw,ci,co] = Σ x_pad[n,h+dh-1,w+dw-1,ci]·dy[n,h,w,co] (XLA; DCE'd
    in the sampler, which never differentiates w.r.t. weights)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = dy.shape[1], dy.shape[2]
    taps = []
    for dh in range(3):
        row = []
        for dw in range(3):
            xs = jax.lax.slice(xp, (0, dh, dw, 0), (xp.shape[0], dh + h, dw + w, xp.shape[3]))
            row.append(
                jnp.einsum(
                    "nhwc,nhwd->cd",
                    xs.astype(jnp.float32),
                    dy.astype(jnp.float32),
                )
            )
        taps.append(jnp.stack(row))
    return jnp.stack(taps).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv_fused(relu, x, kernel, bias, skip):
    return _conv_call(x, kernel, bias, skip, relu)


def _conv_fused_fwd(relu, x, kernel, bias, skip):
    y = _conv_call(x, kernel, bias, skip, relu)
    return y, (x, kernel, y, bias is not None, skip is not None)


def _mask_fusion_enabled() -> bool:
    """ReLU-mask backward fusion (``DCT_CONV_FUSED_MASK=0`` reverts to the
    standalone XLA select + plain dx kernel — the pre-fusion formulation)."""
    import os

    return os.environ.get("DCT_CONV_FUSED_MASK", "1") != "0"


def _conv_fused_bwd(relu, res, dy):
    x, kernel, y, has_bias, has_skip = res
    kf = _flip_transpose(kernel)
    if relu and not _mask_fusion_enabled():
        dy_m = dy * (y > 0).astype(dy.dtype)
        dx = _conv_call(dy_m, kf, None, None, False)
    elif relu and has_skip:
        # dskip keeps the masked dy live, so emit it from the kernel as a
        # second output instead of a standalone full-tensor select.
        dx, dy_m = _conv_call(dy, kf, None, None, False, mask=y, emit_masked=True)
    elif relu:
        # masked dy only feeds dk/db, which DCE when the caller (the
        # sampler) differentiates w.r.t. latents only — so the select below
        # vanishes and the mask rides the dx kernel's operand stream.
        dx = _conv_call(dy, kf, None, None, False, mask=y)
        dy_m = dy * (y > 0).astype(dy.dtype)
    else:
        dy_m = dy
        dx = _conv_call(dy_m, kf, None, None, False)
    dk = _weight_grad(x, dy_m)
    db = jnp.sum(dy_m, axis=(0, 1, 2)).astype(dy.dtype) if has_bias else None
    dskip = dy_m if has_skip else None
    return dx, dk, db, dskip


_conv_fused.defvjp(_conv_fused_fwd, _conv_fused_bwd)


def conv3x3_fused(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    relu: bool = False,
    skip: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``maybe_relu(conv3x3_same(x, kernel) + bias + skip)`` as one kernel.

    x [N,H,W,C] (C ≡ 0 mod 128, W ≡ 0 mod 8), kernel [3,3,C,Co] HWIO,
    bias [Co] or None, skip [N,H,W,Co] or None. Differentiable in
    x / kernel / bias / skip; dx reuses this kernel, the rest are XLA forms
    that vanish under DCE when only latents are differentiated.
    """
    return _conv_fused(relu, x, kernel.astype(x.dtype),
                       None if bias is None else bias.astype(x.dtype), skip)
