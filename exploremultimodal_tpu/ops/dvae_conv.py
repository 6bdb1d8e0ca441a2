"""Fused DALL-E dVAE encoder blocks as Pallas TPU kernels.

The BASELINE.json north-star kernel: the reference tokenizes images through
the OpenAI dVAE encoder conv stack (reference dall_e/encoder.py:50-133) as a
chain of unfused cuDNN convs. Here one Pallas program computes an ENTIRE
bottleneck residual block — relu→3×3→relu→3×3→relu→3×3→relu→1×1, the 1×1
identity path, and the post_gain residual add, optionally fused with the
trailing 2×2 maxpool — for one row-strip of one image, entirely in VMEM:

  HBM → (haloed row strip) → VMEM → 4 convs as MXU matmuls → HBM

so the three hidden tensors and the pre-pool activation never round-trip
through HBM. Each 3×3 conv is computed as 9 (or 3, with dy-stacked patches
when the contraction dim would under-fill the MXU) shifted matmuls over the
strip, accumulating in fp32.

Used for encoder groups 1–2, where spatial dims are large, channels are
small, and all four conv kernels fit VMEM alongside the strip. Groups 3–4
are large-channel matmuls with tiny spatial extent — XLA already runs those
at full MXU efficiency, so they stay on the standard conv path
(models/dvae.py). `encoder_apply_fused` stitches both together into the full
encoder forward on a raw flax param tree.

Correctness subtlety: chained SAME convs zero-pad each INTERMEDIATE, so the
kernel masks every hidden tensor to zero outside the true image extent
before it feeds the next conv — otherwise halo columns would carry conv
extrapolations instead of the zeros XLA pads with. Verified bit-exact
against the XLA fp32 path (tests/test_dvae.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fuse a residual block in Pallas only when its weights fit VMEM comfortably
MAX_FUSED_CIN = 512
# target VMEM footprint per program (bytes); halve the row tile until it
# fits. Calibrated against measured Mosaic compiles on v5e (16 MiB VMEM):
# estimates ≤15 MiB compiled, ≥16.4 MiB hit scoped-vmem OOM.
VMEM_BUDGET = 15 * 1024 * 1024


def _vmem_estimate(T: int, W: int, cin: int, nh: int, cout: int,
                   itemsize: int) -> int:
    """Rough per-program VMEM bytes: input strip scratch + its live value
    copy + dy-stacked patches + fp32 conv accumulators + double-buffered
    output block, plus resident weights."""
    ch = 8 if itemsize == 4 else 16
    khi = 3 * nh if nh < 128 else nh  # dy-stacked contraction width
    act = (
        (T + 6) * (W + 2 * ch) * cin          # xs scratch
        + (T + 6) * (W + 6) * cin             # sliced/relu'd value
        + (T + 4) * (W + 6) * khi             # patches for conv2
        + 2 * T * W * cout                    # double-buffered out block
    ) * itemsize
    acc = (T + 4) * (W + 4) * max(nh, cout) * 4 * 2  # fp32 accumulators
    weights = (9 * (cin * nh + 2 * nh * nh) + nh * cout + cin * cout) * itemsize
    return act + acc + weights


def _pick_row_tile(H: int, W: int, cin: int, nh: int, cout: int,
                   itemsize: int) -> int | None:
    # T=2 is excluded: single-output-row programs crash the v5e runtime
    for T in (16, 8, 4):
        if H % T == 0 and _vmem_estimate(T, W, cin, nh, cout, itemsize) \
                <= VMEM_BUDGET:
            return T
    return None


def _conv3x3_strip(src, w, b, rows_out, cols_out, acc_dtype=jnp.float32):
    """3×3 SAME conv over a VMEM strip via shifted MXU matmuls.

    src: (rows_out + 2, cols_out + 2, Cin) — input strip incl. 1-px halo.
    w: (3, 3, Cin, Cout) flax HWIO kernel. Returns (rows_out, cols_out, Cout)
    in fp32 (caller casts). When Cin < 128 the three dy taps are stacked
    along the contraction axis (K = 3·Cin) to fill the MXU better.
    """
    cin = src.shape[-1]
    cout = w.shape[-1]
    acc = jnp.zeros((rows_out * cols_out, cout), acc_dtype)
    if cin < 128:
        # dy-stacked patches: (rows, cols+2, 3·Cin), one matmul per dx tap
        ph = jnp.concatenate(
            [src[dy : dy + rows_out] for dy in range(3)], axis=-1
        )
        wk = w.reshape(3, 3, cin, cout)
        for dx in range(3):
            lhs = ph[:, dx : dx + cols_out, :].reshape(
                rows_out * cols_out, 3 * cin
            )
            rhs = wk[:, dx].reshape(3 * cin, cout)
            acc = acc + jax.lax.dot_general(
                lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
    else:
        for dy in range(3):
            for dx in range(3):
                lhs = src[dy : dy + rows_out, dx : dx + cols_out, :].reshape(
                    rows_out * cols_out, cin
                )
                acc = acc + jax.lax.dot_general(
                    lhs, w[dy, dx], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )
    return (acc + b.astype(acc_dtype)).reshape(rows_out, cols_out, cout)


def _zero_border(h, halo: int, t, n_tiles: int):
    """Zero the rows/cols of a haloed strip tensor that lie outside the true
    image extent (they are the zero padding of the NEXT conv)."""
    rows, cols = h.shape[0], h.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cols, 1), 1)
    h = jnp.where((col_ids < halo) | (col_ids >= cols - halo), 0.0, h)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    h = jnp.where((t == 0) & (row_ids < halo), 0.0, h)
    h = jnp.where((t == n_tiles - 1) & (row_ids >= rows - halo), 0.0, h)
    return h


def _block_kernel(
    x_hbm, w1, b1, w2, b2, w3, b3, w4, b4, wid, bid, out_ref,
    *, T: int, W: int, post_gain: float, pool: bool, has_id: bool,
    dtype,
):
    """One program = one (image, row-strip): the full bottleneck block."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    cin = x_hbm.shape[-1]
    # column halo must be sublane-aligned for the DMA destination slice
    # (Mosaic: VMEM slice offsets on the tiled dim are multiples of the tile)
    ch = 8 if jnp.dtype(dtype).itemsize == 4 else 16

    def body(xs, sem_body, sem_top, sem_bot):
        xs[:] = jnp.zeros_like(xs)
        # body rows: image rows [t·T, t·T+T) always exist
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * T, T), :, :],
            xs.at[pl.ds(3, T), pl.ds(ch, W), :],
            sem_body,
        )
        cp.start()

        @pl.when(t > 0)
        def _top():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(t * T - 3, 3), :, :],
                xs.at[pl.ds(0, 3), pl.ds(ch, W), :],
                sem_top,
            )
            cp.start()
            cp.wait()

        @pl.when(t < n_tiles - 1)
        def _bot():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(t * T + T, 3), :, :],
                xs.at[pl.ds(T + 3, 3), pl.ds(ch, W), :],
                sem_bot,
            )
            cp.start()
            cp.wait()

        cp.wait()

        # (T+6, W+6, Cin) raw window incl. ±3 halo (identity path reads it
        # unrelu'd); slicing the loaded value is layout-legal at any offset
        x = xs[:, ch - 3 : ch + W + 3, :]
        xr = jnp.maximum(x, 0.0)
        # h1 covers image rows [t·T−2, t·T+T+2), cols [−2, W+2)
        h1 = _conv3x3_strip(xr, w1[:], b1[:], T + 4, W + 4)
        h1 = _zero_border(h1, 2, t, n_tiles).astype(dtype)
        h2 = _conv3x3_strip(jnp.maximum(h1, 0.0), w2[:], b2[:], T + 2, W + 2)
        h2 = _zero_border(h2, 1, t, n_tiles).astype(dtype)
        h3 = _conv3x3_strip(jnp.maximum(h2, 0.0), w3[:], b3[:], T, W)
        # conv4 is 1×1: plain matmul on the strip center
        nh = h3.shape[-1]
        cout = w4.shape[-1]
        h4 = jax.lax.dot_general(
            jnp.maximum(h3, 0.0).astype(dtype).reshape(T * W, nh), w4[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b4[:]
        x_c = x[3 : T + 3, 3 : W + 3, :]
        if has_id:
            ident = jax.lax.dot_general(
                x_c.reshape(T * W, cin), wid[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bid[:]
        else:
            ident = x_c.reshape(T * W, cout).astype(jnp.float32)
        out = (ident + post_gain * h4).reshape(T, W, cout).astype(dtype)
        if pool:
            # 2×2 maxpool via reshape+max (strided slices lower to gathers,
            # which Mosaic rejects beyond 2D)
            out = jnp.max(out.reshape(T // 2, 2, W, cout), axis=1)
            out = jnp.max(out.reshape(T // 2, W // 2, 2, cout), axis=2)
        out_ref[0] = out

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((T + 6, W + 2 * ch, cin), dtype),
        sem_body=pltpu.SemaphoreType.DMA(()),
        sem_top=pltpu.SemaphoreType.DMA(()),
        sem_bot=pltpu.SemaphoreType.DMA(()),
    )


def fused_encoder_block(
    x: jax.Array,
    params: dict,
    post_gain: float,
    *,
    pool: bool = False,
    row_tile: int | None = None,
) -> jax.Array:
    """Apply one EncoderBlock (+ optional trailing 2×2 maxpool) as a single
    fused Pallas kernel. x: (B, H, W, Cin) NHWC; params: the flax param
    subtree of models.dvae.EncoderBlock ({conv_1..conv_4, [id_conv]})."""
    B, H, W, cin = x.shape
    w1 = params["conv_1"]["conv"]["kernel"]
    nh = w1.shape[-1]
    cout = params["conv_4"]["conv"]["kernel"].shape[-1]
    has_id = "id_conv" in params
    dtype = x.dtype

    T = row_tile or _pick_row_tile(H, W, cin, nh, cout, x.dtype.itemsize)
    if T is None or H % T or (pool and T % 2):
        raise ValueError(f"image height {H} not tileable within VMEM budget")

    out_h, out_w = (H // 2, W // 2) if pool else (H, W)
    kernel = functools.partial(
        _block_kernel, T=T, W=W, post_gain=post_gain, pool=pool,
        has_id=has_id, dtype=dtype,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    args = [
        w1.astype(dtype), params["conv_1"]["conv"]["bias"],
        params["conv_2"]["conv"]["kernel"].astype(dtype),
        params["conv_2"]["conv"]["bias"],
        params["conv_3"]["conv"]["kernel"].astype(dtype),
        params["conv_3"]["conv"]["bias"],
        # 1×1 convs as plain matrices
        params["conv_4"]["conv"]["kernel"][0, 0].astype(dtype),
        params["conv_4"]["conv"]["bias"],
    ]
    if has_id:
        args += [params["id_conv"]["conv"]["kernel"][0, 0].astype(dtype),
                 params["id_conv"]["conv"]["bias"]]
    else:  # placeholders keep the kernel signature static
        args += [jnp.zeros((1, cout), dtype), jnp.zeros((cout,), jnp.float32)]

    flops_conv = (
        9 * (cin * nh + 2 * nh * nh) + nh * cout + (cin * cout if has_id else 0)
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, out_h, out_w, cout), dtype),
        grid=(B, H // T),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vmem] * 10,
        out_specs=pl.BlockSpec(
            (1, out_h // (H // T), out_w, cout),
            lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * flops_conv,
            bytes_accessed=B * H * W * (cin + cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, *args)


# ------------------------------------------------------- full encoder apply


def _xla_block(x, params, post_gain, dtype):
    """Reference XLA path for one block (mirrors models.dvae.EncoderBlock)."""

    def conv(p, x, pad):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), p["conv"]["kernel"].astype(dtype),
            window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["conv"]["bias"].astype(dtype)

    ident = conv(params["id_conv"], x, 0) if "id_conv" in params else x
    h = conv(params["conv_1"], jnp.maximum(x, 0), 1)
    h = conv(params["conv_2"], jnp.maximum(h, 0), 1)
    h = conv(params["conv_3"], jnp.maximum(h, 0), 1)
    h = conv(params["conv_4"], jnp.maximum(h, 0), 0)
    return ident + jnp.asarray(post_gain, dtype) * h


def encoder_apply_fused(
    params: dict,
    x: jax.Array,
    *,
    dtype=jnp.float32,
    group_count: int = 4,
    n_blk_per_group: int = 2,
) -> jax.Array:
    """Full dVAE encoder forward on a raw flax param tree, with groups whose
    blocks qualify (Cin ≤ MAX_FUSED_CIN, tileable height) running through the
    fused Pallas block kernel and the rest through XLA convs. Numerically
    equivalent to models.dvae.DalleEncoder.apply (tests/test_dvae.py)."""
    post_gain = 1.0 / (group_count * n_blk_per_group) ** 2
    x = x.astype(dtype)
    ic = params["input_conv"]["conv"]
    x = jax.lax.conv_general_dilated(
        x, ic["kernel"].astype(dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + ic["bias"].astype(dtype)

    for g in range(1, group_count + 1):
        do_pool = g < group_count
        for blk in range(1, n_blk_per_group + 1):
            p = params[f"group_{g}_block_{blk}"]
            w1 = p["conv_1"]["conv"]["kernel"]
            cin, nh = w1.shape[2], w1.shape[3]
            cout = p["conv_4"]["conv"]["kernel"].shape[-1]
            last = blk == n_blk_per_group
            # Mosaic HBM DMA slices need 128-aligned channel extents
            fuse = (
                cin <= MAX_FUSED_CIN
                and cin % 128 == 0
                and _pick_row_tile(x.shape[1], x.shape[2], cin, nh, cout,
                                   x.dtype.itemsize) is not None
            )
            if fuse:
                x = fused_encoder_block(
                    x, p, post_gain, pool=do_pool and last
                )
                if do_pool and last:
                    do_pool = False  # pool already fused into the block
            else:
                x = _xla_block(x, p, post_gain, dtype)
        if do_pool:
            x = jax.lax.reduce_window(
                x, jnp.asarray(-jnp.inf, x.dtype), jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            )

    x = jnp.maximum(x, 0)
    oc = params["output_conv"]["conv"]
    # final projection kept fp32 (argmax tie-breaks), as in models.dvae
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), oc["kernel"].astype(jnp.float32), (1, 1),
        [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + oc["bias"]
