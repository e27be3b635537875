"""Pallas TPU kernels: fused 3×3 conv (+ReLU, + fused-row 2×2 maxpool) for
SuperPoint's full/half-resolution stem blocks.

Why: the stem dominates SuperPoint's dense pass. XLA's conv emitter runs
the (480, 752, 64)→64 3×3 convs at ~14 TFLOP/s on v5e because 64-channel
3×3 convs tile shallowly onto the 128×128 MXU (nine 64-deep passes), and
each conv round-trips its full-resolution activations through HBM. This
kernel computes each output row as ONE (C_out, 576)·(576, W) MXU matmul —
a 576-deep contraction over the full 3×3×64 im2col, built in VMEM from
shifted 2D slabs — and fuses bias, ReLU and the row half of the 2×2
maxpool.

Measured on v5e (B=2 stereo pair, 480×752, chained on-device scan so relay
dispatch latency cannot hide or inflate anything): XLA stem 5.88 ms,
fused Pallas stem 3.84 ms → 1.53× on the stem.

Layout design (measured, not guessed):
- activations travel in channel-major "NHCW" (batch, row, channel, col): an
  image row is a natural (C, W) slab, so row taps are outer-dim slices,
  column taps are lane rolls, and the im2col is a sublane concatenation;
- materializing NHCW *from an XLA NHWC conv* costs ~2 ms of relayout at
  these shapes — so conv1a (cin=1) is instead computed as an XLA batched
  einsum (C,9)·(9,W) over (B,H) whose natural output is already NHCW;
- Mosaic rotates are 32-bit only, so the two column-tap rolls round-trip
  the tile through f32 once (two cheap VPU casts);
- the column half of the maxpool runs in XLA (lane-strided downsampling
  has no Mosaic lowering); the row half is fused here;
- halo rows/cols are zero-padded by the caller in XLA (layout-preserving).

Semantics match the XLA path in models/superpoint.py exactly (SAME zero
padding, bias+ReLU in f32, bf16 tensors); the reference's equivalent is the
TensorRT engine's VGG stem (convert2onnx/superpoint.py:116-127,
super_point.cpp:97-135).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_nhcw", "conv1a_nhcw", "conv3x3_cin1_nhcw",
           "superpoint_stem"]

_TH = 16  # output rows per grid step (pooled rows per tile = _TH/2 ≥ 8)


def _conv_kernel(TH: int, W: int, Wp: int, C: int, pool: bool,
                 side: bool = False):
    """``side``: emit a second output — the per-pixel dot of the ReLU'd
    conv output with a folded side-branch weight vector, at FULL (pre-pool)
    resolution. This is RCF's stage-1 side score (models/rcf.py), computed
    here so the pooled main path never has to materialize the unpooled
    activations in HBM."""
    def kernel(*refs):
        if side:
            x_hbm, w_ref, b_ref, sw_ref, out_ref, side_ref, ys, sems = refs
        else:
            x_hbm, w_ref, b_ref, out_ref, ys, sems = refs
        i = pl.program_id(1)
        bidx = pl.program_id(0)
        r0 = i * TH
        # halo DMA: padded input rows [r0, r0 + TH + 2) — output row s of
        # this tile needs padded rows s .. s+2 (pad offset +1 = halo).
        # dim 1 of (B, Hp, C, Wp) is untiled, so any offset/size is legal.
        cp = pltpu.make_async_copy(
            x_hbm.at[bidx, pl.ds(r0, TH + 2), :, :], ys, sems
        )
        cp.start()
        cp.wait()

        # column taps b=1,2 as whole-tile lane rotates, done ONCE per tile
        # (f32 round-trip: Mosaic rotates are 32-bit only). Wrapped-in
        # lanes land beyond col W where the padded input is zero.
        flat = ys[:].reshape((TH + 2) * C, Wp)
        taps = [flat]
        f32 = flat.astype(jnp.float32)
        for b in (1, 2):
            taps.append(
                pltpu.roll(f32, shift=Wp - b, axis=1).astype(jnp.bfloat16)
            )
        taps = [t.reshape(TH + 2, C, Wp) for t in taps]

        rows_out = TH // 2 if pool else TH

        def conv_row(s):
            A = jnp.concatenate(
                [taps[b][s + a, :, :W] for a in range(3) for b in range(3)],
                axis=0,
            )  # (9C, W): row (a·3+b)·C + ci = tap (a,b) of channel ci
            y = jax.lax.dot_general(
                w_ref[:], A,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C_out, W)
            return jax.nn.relu(y + b_ref[:])

        def side_row(y, s):
            # (C, W) ReLU'd conv output → scalar-per-pixel side score row
            side_ref[0, s:s + 1] = jnp.sum(y * sw_ref[:], axis=0,
                                           keepdims=True)

        if pool:
            # rows pooled here; columns pooled by the caller in XLA
            for u in range(rows_out):
                y0 = conv_row(2 * u)
                y1 = conv_row(2 * u + 1)
                if side:
                    side_row(y0, 2 * u)
                    side_row(y1, 2 * u + 1)
                out_ref[0, u] = jnp.maximum(y0, y1).astype(jnp.bfloat16)
        else:
            for s in range(rows_out):
                y = conv_row(s)
                if side:
                    side_row(y, s)
                out_ref[0, s] = y.astype(jnp.bfloat16)

    return kernel


@partial(jax.jit, static_argnames=("pool", "interpret", "col_pool"))
def conv3x3_nhcw(
    x: jnp.ndarray,  # (B, H, C, W) bfloat16 NHCW, unpadded
    w: jnp.ndarray,  # (3, 3, C, C_out) HWIO
    b: jnp.ndarray,  # (C_out,)
    pool: bool = False,
    interpret: bool = False,
    side_w: jnp.ndarray | None = None,  # (C_out,) folded side weight
    col_pool: bool = True,
):
    """ReLU(conv3×3(x) + b), optionally followed by 2×2 maxpool, fused into
    one TPU kernel per row-tile. Returns (B, H', C_out, W') NHCW bf16 with
    H' = H/2, W' = W/2 when pooling (``col_pool=False`` leaves the column
    half of the pool to the caller — cheaper when the caller transposes to
    NHWC anyway and can pool there).

    With ``side_w``, returns a tuple: the second element is the per-pixel
    side score Σ_c side_w[c]·ReLU(conv)[c] at FULL resolution (B, H, W) f32
    — RCF's stage side output, fused so the pre-pool activations never hit
    HBM."""
    B, H, C, W = x.shape
    C_out = w.shape[3]
    assert w.shape[:3] == (3, 3, C), w.shape
    assert (not pool or H % 2 == 0) and W % 2 == 0, (H, W)
    # round rows up to the tile size; pad rows are zero, which matches SAME
    # padding semantics exactly, and their outputs are sliced off below
    # (needed for OIVIO's 720-row images whose half-res stage is 360)
    Hr = ((H + _TH - 1) // _TH) * _TH
    Wp = ((W + 2 + 127) // 128) * 128
    Hp = Hr + 2
    xp = jnp.zeros((B, Hp, C, Wp), jnp.bfloat16)
    xp = xp.at[:, 1:1 + H, :, 1:1 + W].set(x.astype(jnp.bfloat16))

    # (C_out, 576=(a,b,ci)) to match the im2col row order
    wf = jnp.transpose(w, (3, 0, 1, 2)).reshape(C_out, 9 * C).astype(jnp.bfloat16)
    bf = b.reshape(C_out, 1).astype(jnp.float32)

    NT = Hr // _TH
    Ho = Hr // 2 if pool else Hr
    TH_o = _TH // 2 if pool else _TH
    side = side_w is not None
    out_shapes = [jax.ShapeDtypeStruct((B, Ho, C_out, W), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((1, TH_o, C_out, W), lambda b, i: (b, i, 0, 0),
                              memory_space=pltpu.VMEM)]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM; manual DMA
        pl.BlockSpec((C_out, 9 * C), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C_out, 1), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, wf, bf]
    if side:
        in_specs.append(pl.BlockSpec((C_out, 1), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(side_w.reshape(C_out, 1).astype(jnp.float32))
        out_shapes.append(jax.ShapeDtypeStruct((B, Hr, W), jnp.float32))
        out_specs.append(pl.BlockSpec((1, _TH, W), lambda b, i: (b, i, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        _conv_kernel(_TH, W, Wp, C, pool, side),
        out_shape=out_shapes if side else out_shapes[0],
        grid=(B, NT),
        in_specs=in_specs,
        out_specs=out_specs if side else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((_TH + 2, C, Wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    out = res[0] if side else res
    out = out[:, : H // 2 if pool else H]  # drop row-padding outputs
    if pool and col_pool:  # column half of the 2×2 maxpool
        out = jax.lax.reduce_window(
            out, jnp.asarray(-jnp.inf, out.dtype), jax.lax.max,
            (1, 1, 1, 2), (1, 1, 1, 2), "VALID",
        )
    if side:
        return out, res[1][:, :H]
    return out


def conv1a_nhcw(params: dict, images: jnp.ndarray) -> jnp.ndarray:
    """SuperPoint conv1a: see :func:`conv3x3_cin1_nhcw`."""
    return conv3x3_cin1_nhcw(params["conv1a"]["w"], params["conv1a"]["b"],
                             images)


def conv3x3_cin1_nhcw(w: jnp.ndarray, b: jnp.ndarray,
                      images: jnp.ndarray) -> jnp.ndarray:
    """3×3 conv with cin=1 (+ReLU) emitting channel-major (B, H, C, W)
    natively. ``w`` (3, 3, 1, C), ``images`` (B, H, W).

    Computed as a batched (C, 9)·(9, W) einsum over (B, H) — its natural
    output order IS channel-major, so no relayout is ever materialized
    (an XLA NHWC conv followed by a transpose costs ~2 ms at 480×752×64)."""
    B, H, W = images.shape
    C = w.shape[3]
    img = images.astype(jnp.bfloat16)
    z = jnp.zeros_like(img[:, :1, :])
    rows = {-1: jnp.concatenate([z, img[:, :-1, :]], 1),
            0: img,
            1: jnp.concatenate([img[:, 1:, :], z], 1)}
    zc = jnp.zeros_like(img[:, :, :1])
    taps = []
    for a in (-1, 0, 1):
        r = rows[a]
        taps.append(jnp.concatenate([zc, r[:, :, :-1]], 2))
        taps.append(r)
        taps.append(jnp.concatenate([r[:, :, 1:], zc], 2))
    patches = jnp.stack(taps, axis=2)  # (B, H, 9, W), tap k = (a·3+b)
    wf = w.reshape(9, C).T.astype(jnp.bfloat16)  # (C, 9)
    y = jnp.einsum("ck,bhkw->bhcw", wf, patches,
                   preferred_element_type=jnp.float32)
    y = y + b.astype(jnp.float32)[None, None, :, None]
    return jax.nn.relu(y).astype(jnp.bfloat16)


def superpoint_stem(params: dict, images: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused SuperPoint stage-1 stem: conv1a, conv1b + the first maxpool.

    images (B, H, W) in [0,1] → (B, H/2, W/2, 64) bf16 NHWC, ready for
    conv2a. conv1a runs as the channel-major XLA einsum; the full-res
    64-channel conv1b runs in the fused Pallas kernel with the row half of
    the pool. conv2a/conv2b stay on XLA's conv emitter — measured on v5e
    it beats the row-matmul kernel at half-res shapes (see models/rcf.py
    _stem_pallas), so the kernel only covers the layer where it wins."""
    y = conv1a_nhcw(params, images)  # (B, H, 64, W)
    y = conv3x3_nhcw(y, params["conv1b"]["w"], params["conv1b"]["b"],
                     pool=True, col_pool=False, interpret=interpret)
    y = jnp.transpose(y, (0, 1, 3, 2))  # (B, H/2, W, 64) NHWC
    return jax.lax.reduce_window(
        y, jnp.asarray(-jnp.inf, y.dtype), jax.lax.max,
        (1, 1, 2, 1), (1, 1, 2, 1), "VALID",
    )
