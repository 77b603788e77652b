"""RoIAlign as a Pallas TPU kernel.

Formulation: bilinear sampling + bin averaging is separable, so
RoIAlign is two matmuls per ROI —

    out[r, i, j, c] = Wy[r, i, :] @ fmap[:, :, c] @ Wx[r, j, :]^T

with hat-function weight matrices Wy (R, O, H) / Wx (R, O, W) built on
the host side of the jit (cheap elementwise). The kernel tiles over
(batch, roi-chunk, channel-block) so the fmap block, both weight blocks
and the (RC·O, W·CC) intermediate stay in VMEM, and both contractions
run on the MXU — replacing the gather-based formulation which the VPU
executes element-by-element.

Numerics match fgn_tpu.ops.roi_align exactly (same sample points, same
out-of-range/clamping behaviour) — see tests/test_roi_align_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat_weights(start, bin_size, size: int, out_size: int, ratio: int):
    """(..., O, size) averaging-bilinear weight matrix for one axis.

    start/bin_size: (...,) roi start coordinate and bin extent."""
    O, S = out_size, ratio
    grid = (
        jnp.arange(O, dtype=jnp.float32)[:, None]
        + (jnp.arange(S, dtype=jnp.float32)[None, :] + 0.5) / S
    )  # (O, S)
    pts = start[..., None, None] + bin_size[..., None, None] * grid  # (..., O, S)
    oob = (pts <= -1.0) | (pts >= size)
    ptsc = jnp.clip(pts, 0.0, size - 1)
    idx = jnp.arange(size, dtype=jnp.float32)
    # (..., O, S, size) hat around each sample point; zero for OOB points.
    w = jnp.maximum(1.0 - jnp.abs(ptsc[..., None] - idx), 0.0)
    w = jnp.where(oob[..., None], 0.0, w)
    return w.sum(axis=-2) / float(S)  # (..., O, size)


def _chunk_contract(wy, wx, f):
    """Two MXU contractions for one ROI chunk.

    wy (RC, O, H), wx (RC, O, W), f (H, W, CC) f32 → (RC, O, O, CC)."""
    RC, O, H = wy.shape
    W = wx.shape[-1]
    CC = f.shape[-1]
    # First contraction: (RC*O, H) @ (H, W*CC)
    tmp = jnp.dot(
        wy.reshape(RC * O, H),
        f.reshape(H, W * CC),
        preferred_element_type=jnp.float32,
    ).reshape(RC, O, W, CC)
    # Second contraction per roi: (O*CC, W) @ (W, O)
    lhs = tmp.transpose(0, 1, 3, 2).reshape(RC, O * CC, W)
    rhs = wx.transpose(0, 2, 1)  # (RC, W, O)
    out = jax.lax.dot_general(
        lhs, rhs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (RC, O*CC, O)
    return out.reshape(RC, O, CC, O).transpose(0, 1, 3, 2)


def _kernel(wy_ref, wx_ref, f_ref, o_ref):
    """Grid (B, C//CC, Rp//RC): one ROI chunk per invocation."""
    o_ref[0] = _chunk_contract(
        wy_ref[0], wx_ref[0], f_ref[0].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _kernel_roi_loop(rc: int, wy_ref, wx_ref, f_ref, o_ref):
    """Grid (B, C//CC, Rp//slab): the slab's ROI chunks looped inside
    one invocation (fori_loop over VMEM-resident inputs) — ~slab/RC
    fewer invocations than the plain 3-D grid at ~10 µs fixed cost
    each (reports/perf_profile.md:76-82), same arithmetic per chunk
    (bit-identical outputs, tests/test_roi_align_pallas.py)."""
    f = f_ref[0].astype(jnp.float32)  # (H, W, CC) — cast once, in-VMEM
    nchunks = wy_ref.shape[1] // rc

    def body(i, _):
        sl = pl.ds(i * rc, rc)
        o_ref[0, sl] = _chunk_contract(
            wy_ref[0, sl], wx_ref[0, sl], f
        ).astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, nchunks, body, 0)


def roi_align_pallas(
    fmap: jnp.ndarray,  # (B, H, W, C)
    rois: jnp.ndarray,  # (B, R, 4) XYXY
    out_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
    # Tile sizes chosen to fit VMEM (16 MB) incl. double buffering and the
    # (RC·O, W·CC) intermediate at COCO-scale maps (84×84 fmap, C=1024).
    roi_chunk: int = 8,
    channel_block: int = 128,
    interpret: bool = False,
    roi_loop: bool = True,
) -> jnp.ndarray:
    """Differentiable wrt ``fmap`` (custom VJP: the transposed matmul
    pair, chunked over rois). Like torchvision, no gradient flows to the
    roi coordinates.

    ``roi_loop=True`` (default) sweeps the ROI chunks inside the kernel
    (grid B × C/CC); ``False`` keeps the ROI axis on the grid — same
    arithmetic either way, kept for A/B parity tests."""
    f = _vjp_fn(
        out_size, spatial_scale, sampling_ratio, aligned,
        roi_chunk, channel_block, interpret, roi_loop,
    )
    return f(fmap, rois)


@functools.lru_cache(maxsize=None)
def _vjp_fn(out_size, spatial_scale, sampling_ratio, aligned,
            roi_chunk, channel_block, interpret, roi_loop=True):
    fwd_impl = functools.partial(
        _forward, out_size=out_size, spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio, aligned=aligned,
        roi_chunk=roi_chunk, channel_block=channel_block,
        interpret=interpret, roi_loop=roi_loop,
    )

    @jax.custom_vjp
    def f(fmap, rois):
        return fwd_impl(fmap, rois)

    def f_fwd(fmap, rois):
        # zero-size dtype witness: np.dtype itself is not a JAX type
        return fwd_impl(fmap, rois), (
            rois, fmap.shape, jnp.zeros((), fmap.dtype)
        )

    def f_bwd(res, g):
        rois, fshape, fwitness = res
        fdtype = fwitness.dtype
        B, H, W, C = fshape
        O = out_size
        wy, wx = _roi_weights(
            rois, H, W, O, spatial_scale, sampling_ratio, aligned
        )  # (B, R, O, H/W)
        R = rois.shape[1]
        RC = min(roi_chunk * 4, R)
        pad = (-R) % RC
        if pad:
            wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
            wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
            g = jnp.pad(g, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        nchunks = (R + pad) // RC

        def body(df, i):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * RC, RC, axis=1)
            gyc = jnp.einsum(
                "brih,brijc->brhjc", sl(wy), sl(g).astype(jnp.float32)
            )  # (B, RC, H, O, C)
            df = df + jnp.einsum("brhjc,brjw->bhwc", gyc, sl(wx))
            return df, None

        df, _ = jax.lax.scan(
            body, jnp.zeros((B, H, W, C), jnp.float32), jnp.arange(nchunks)
        )
        return df.astype(fdtype), jnp.zeros_like(rois)

    f.defvjp(f_fwd, f_bwd)
    return jax.jit(f)


def _roi_weights(rois, H, W, O, spatial_scale, sampling_ratio, aligned):
    offset = 0.5 if aligned else 0.0
    x1 = rois[..., 0] * spatial_scale - offset
    y1 = rois[..., 1] * spatial_scale - offset
    rw = rois[..., 2] * spatial_scale - offset - x1
    rh = rois[..., 3] * spatial_scale - offset - y1
    if not aligned:
        rw = jnp.maximum(rw, 1.0)
        rh = jnp.maximum(rh, 1.0)
    wy = _hat_weights(y1, rh / O, H, O, sampling_ratio)
    wx = _hat_weights(x1, rw / O, W, O, sampling_ratio)
    return wy, wx


def _forward(
    fmap: jnp.ndarray,
    rois: jnp.ndarray,
    out_size: int,
    spatial_scale: float,
    sampling_ratio: int,
    aligned: bool,
    roi_chunk: int,
    channel_block: int,
    interpret: bool,
    roi_loop: bool,
) -> jnp.ndarray:
    B, H, W, C = fmap.shape
    R = rois.shape[1]
    O = out_size
    wy, wx = _roi_weights(
        rois, H, W, O, spatial_scale, sampling_ratio, aligned
    )  # (B, R, O, H), (B, R, O, W)

    CC = min(channel_block, C)
    assert C % CC == 0, f"C={C} must tile by channel_block={CC}"
    # ROI-chunk size: the biggest divisor of R that keeps the (RC·O,
    # W·CC) f32 intermediate inside a ~3 MB VMEM budget — a divisor
    # means NO padding, so the out[:, :R] slice (a full-tensor copy at
    # the old RC=8) disappears and the MXU sees M = RC·O rows per dot.
    # (Budget lowered 5.5 → 3 MB with the in-kernel ROI loop: the full
    # weight tensors + double-buffered out block now share VMEM.)
    cap = max(int(3e6) // (O * W * CC * 4), 1)
    cap = min(cap, 32, R)
    RC = max((d for d in range(1, cap + 1) if R % d == 0), default=1)
    if RC < 8 and R > cap:  # awkward R (e.g. prime): pad instead
        RC = min(roi_chunk, cap)
    pad_r = (-R) % RC
    if pad_r:
        wy = jnp.pad(wy, ((0, 0), (0, pad_r), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, pad_r), (0, 0), (0, 0)))
    Rp = R + pad_r

    cost = pl.CostEstimate(
        flops=2 * B * Rp * O * H * W * C + 2 * B * Rp * O * O * W * C,
        bytes_accessed=(
            B * H * W * C * fmap.dtype.itemsize
            + B * Rp * O * (H + W) * 4 * (C // CC)
            + B * Rp * O * O * C * fmap.dtype.itemsize
        ),
        transcendentals=0,
    )
    if roi_loop:
        # ROI-slab grid with an in-kernel chunk loop: the r sweep runs
        # as a fori_loop over RC-chunks INSIDE each invocation, cutting
        # the per-invocation fixed cost (~2.5 ms/step at the 300-ROI
        # test geometry, perf_profile.md:76-82) by the slab factor —
        # but the slab is BOUNDED so the double-buffered (1, slab, O,
        # O, CC) out block stays ≤ ~1.5 MB: a full-R out block VMEM-
        # OOMed at the (4, 300, 7, 7, 1024) eval geometry (scoped-vmem
        # 19.2 M > 16 M limit, observed round 5). r stays innermost so
        # the fmap block remains VMEM-resident across the whole sweep.
        cap_slab = max(
            int(1.5e6) // (O * O * CC * fmap.dtype.itemsize), RC
        )
        k_max = max(cap_slab // RC, 1)
        k = next(
            (kk for kk in range(k_max, 0, -1) if Rp % (RC * kk) == 0), 1
        )
        slab = RC * k
        pad2 = (-Rp) % slab
        if pad2:
            wy = jnp.pad(wy, ((0, 0), (0, pad2), (0, 0), (0, 0)))
            wx = jnp.pad(wx, ((0, 0), (0, pad2), (0, 0), (0, 0)))
            Rp += pad2
        out = pl.pallas_call(
            functools.partial(_kernel_roi_loop, RC),
            grid=(B, C // CC, Rp // slab),
            in_specs=[
                pl.BlockSpec(
                    (1, slab, O, H), lambda b, c, r: (b, r, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, slab, O, W), lambda b, c, r: (b, r, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, H, W, CC), lambda b, c, r: (b, 0, 0, c),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, slab, O, O, CC), lambda b, c, r: (b, r, 0, 0, c),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, Rp, O, O, C), fmap.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(wy, wx, fmap)
    else:
        out = pl.pallas_call(
            _kernel,
            # r innermost: the fmap block's index (b, c) is unchanged
            # across the whole r sweep, so Pallas keeps it VMEM-resident
            # instead of re-fetching it per ROI chunk (the old (b, r, c)
            # order re-read the fmap Rp/RC times — ~0.5 GB/step at the
            # 300-proposal test geometry, the #1 op in the round-4
            # device profile).
            grid=(B, C // CC, Rp // RC),
            in_specs=[
                pl.BlockSpec(
                    (1, RC, O, H), lambda b, c, r: (b, r, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, RC, O, W), lambda b, c, r: (b, r, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, H, W, CC), lambda b, c, r: (b, 0, 0, c),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, RC, O, O, CC), lambda b, c, r: (b, r, 0, 0, c),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, Rp, O, O, C), fmap.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(wy, wx, fmap)
    return out[:, :R] if out.shape[1] != R else out
