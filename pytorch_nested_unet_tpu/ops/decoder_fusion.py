"""Pallas-fused upsample+concat+conv3x3 for the nested-decoder hot spot.

This is the SURVEY §7 step-10 fusion target: every decoder node of
NestedUNet/UNet computes ``conv3x3(concat(skips..., upsample2x(low)))``
(reference archs_backup.py:123-141), and on the XLA path the channel concat
and the bilinear upsample each materialize a full activation tensor in HBM
on both the forward and backward passes.  ``tools/fusion_probe.py`` measured
that materialization traffic at ~1.3 ms of the 15.1 ms flagship train step
(v5e, batch 16, 96x96), concentrated in the four 96x96 nodes.

TPU-first formulation
---------------------
A 3x3 stride-1 conv lowered the obvious way (im2col matmul
``[H*W, 9*Cin] @ [9*Cin, Cout]``) is lane-starved on the MXU when
``Cout=32``: the output tile pads 32 -> 128 lanes, capping utilization at
~25%.  We instead decompose by *taps*:

    out[r, w] = sum_{a,b in 0..2} y_(a,b)[r+a-1, w+b-1]
    y_(a,b)   = in @ K[a, b]                  # a 1x1 conv per tap

and batch all nine taps into ONE matmul with a lane-packed RHS:

    y9 = in_flat @ K9        # [H*W, Cin] @ [Cin, 9*Cout]  -> 9*32 = 288 lanes

followed by a cheap VPU shift-add of the nine column groups.  The wide N
dimension lifts MXU utilization ~3x over the im2col form, and because the
kernel reads the skip tensors and the upsampled feed as *separate* inputs —
each part contracts against its own K9 row-slice, accumulated in a VMEM
scratch — the concatenated activation never exists anywhere, HBM or VMEM.  The 2x bilinear upsample itself stays outside (the
matmul-form ``ops.resize`` is already MXU-shaped and its output feeds this
kernel directly); align_corners=True makes its sampling phase non-uniform
(stride 47/95 at 48->96), which is exactly why it composes poorly INTO the
conv and is kept as a separate dense contraction.

The backward pass is plain XLA (custom_vjp whose bwd re-derives the conv
VJP from the reference formulation — conv is linear, so no primal recompute
survives DCE).  A Pallas backward pair (shift-scatter dy9 + wide-K matmuls)
was built and measured first; see the negative result below.

Numerics: the tap matmul accumulates in f32 (``preferred_element_type``) and
the nine-tap shift-add runs in an f32 VMEM accumulator, so the fused path is
at least as accurate as the XLA bf16 conv it replaces; in f32 it matches the
reference conv to float roundoff (see tests/test_decoder_fusion.py).

MEASURED — NEGATIVE RESULT (v5e, batch 16, bf16, two-length scan fit,
tools/decoder_fusion_bench.py, 2026-08-17).  Per NestedUNet decoder node,
fwd+bwd with the full Pallas fwd+bwd pair:

    x0_1 (96x96, cin  96, co  32): XLA  729.6 us | fused 1446.7 us  (-717)
    x1_1 (48x48, cin 192, co  64): XLA  329.1 us | fused  352.1 us  ( -23)
    x2_1 (24x24, cin 384, co 128): XLA  166.5 us | fused  219.2 us  ( -53)
    3-part nodes (x0_2...)       : Pallas wgrad kernel OOMs scoped VMEM

and forward-only (the inference path):

    x0_1 -136 | x1_1 +13 | x2_1 -3 | x0_2 -193 | x1_2 -38 | x2_2 +4
    x0_3 +94  | x1_3 +19 | x0_4: fwd kernel OOMs scoped VMEM (cin 192)
    net over the 8 compiling eligible nodes: -140 us vs XLA

Why it loses: (1) at co=32 the 9-group shift-add needs lane rotations at
32-lane offsets out of the 288-lane y9 — VPU retile cost ~4x the MXU time;
(2) the per-part tap matmuls are K-shallow (K=cin_part vs XLA's im2col
K=9*cin), wasting MXU depth; (3) the backward's 9x-expanded dy9 scatter
re-creates the exact traffic blowup documented for ShiftConv
(ops/small_conv.py).  XLA's conv + fused concat is already within the
fusion headroom tools/fusion_probe.py measured (<=8.5%% of the step), so
the op ships DISABLED; `enable_decoder_fusion(True)` keeps the fwd kernel
runnable (tested in interpret mode) for future revisits — a W-unfold form
(K=3*cin, N=3*co) would fix (2) but not the dominant (1).
"""

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

# Enabled explicitly for single-chip runs (train.py/bench.py), mirrored on
# ops.fused_bn: the kernel is a per-device program, so under a pjit/GSPMD mesh
# it would need shard_map wiring — the plain XLA path stays on there.
_ENABLED = False
_INTERPRET = False

# Per-program row-chunk height: bounds the f32 y9 scratch
# ((CHUNK+2) * W * 9*Cout floats) while keeping matmuls M-large.
_CHUNK = 8
# VMEM budget guard for the auto path (bytes; see the calibration note in
# _supported — Mosaic's real stack accounting runs ~1.6x the estimate).
_VMEM_BUDGET = 10 * 1024 * 1024


def enable_decoder_fusion(on: bool = True, interpret: bool = False):
    global _ENABLED, _INTERPRET
    _ENABLED = bool(on)
    _INTERPRET = bool(interpret)


def decoder_fusion_enabled() -> bool:
    return _ENABLED and HAS_PALLAS


def reference_multipart_conv3x3(parts: Sequence[jax.Array], kernel: jax.Array,
                                bias: Optional[jax.Array] = None) -> jax.Array:
    """XLA path: conv3x3(concat(parts), kernel) + bias — the semantics spec."""
    x = jnp.concatenate(list(parts), axis=-1) if len(parts) > 1 else parts[0]
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _supported(parts, kernel) -> bool:
    if not HAS_PALLAS:
        return False
    b, h, w = parts[0].shape[0], parts[0].shape[1], parts[0].shape[2]
    co = kernel.shape[-1]
    cin = sum(int(p.shape[-1]) for p in parts)
    if kernel.shape[:2] != (3, 3) or kernel.shape[2] != cin:
        return False
    if w % 8 != 0 or h < 2 or w < 8 or co > 128:
        return False
    if any(p.shape[:3] != (b, h, w) for p in parts):
        return False
    dt = parts[0].dtype
    if dt not in (jnp.bfloat16, jnp.float32) or any(p.dtype != dt for p in parts):
        return False
    # VMEM estimate: grid blocks are double-buffered by the Mosaic pipeline.
    # Calibrated against measured compiles (v5e): cin 160 @ 96x96 fits
    # (~9.5MB by this model), cin 192 @ 96x96 blows the 16MB scoped limit
    # (~10.6MB by this model) — Mosaic's true stack accounting runs ~1.6x
    # this estimate, hence the 10MB budget.
    esz = 2 if dt == jnp.bfloat16 else 4
    n9 = 9 * co
    blocks = 2 * (sum(h * w * p.shape[-1] for p in parts) + h * w * co) * esz
    scratch = ((_CHUNK + 2) * w * n9 * 4 * 2      # y9 f32 scratch + live dot temp
               + _CHUNK * w * co * 4)             # out accumulator f32
    return blocks + scratch + cin * n9 * esz < _VMEM_BUDGET


def _chunks(h):
    return [(r0, min(r0 + _CHUNK, h)) for r0 in range(0, h, _CHUNK)]


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, cps, h, w, co):
    nparts = len(cps)
    part_refs = refs[:nparts]
    k9_ref, bias_ref, out_ref, y9_ref, acc_ref = refs[nparts:]
    n9 = 9 * co
    dt = part_refs[0].dtype

    bias_row = bias_ref[:].astype(jnp.float32)  # [1, co]

    for r0, r1 in _chunks(h):
        ylo, yhi = max(r0 - 1, 0), min(r1 + 1, h)
        n = yhi - ylo
        # Tap-matmul for the chunk (+1-row halo each side), one dot per part
        # accumulated into the y9 SCRATCH ref.  The virtual concat never
        # exists: each part contracts against its own K9 row-slice.  Writing
        # through the scratch (rather than keeping a chunk temp alive through
        # the shift-add) keeps every dot temp short-lived so Mosaic's stack
        # allocator reuses ONE slot across the unrolled chunks — the temp-per-
        # chunk form blew the 16MB scoped-vmem limit at the 96x96 nodes.
        off = 0
        for pref, cp in zip(part_refs, cps):
            contrib = jnp.dot(
                pref[0, ylo:yhi, :, :].reshape(n * w, cp),
                k9_ref[off:off + cp, :],
                preferred_element_type=jnp.float32).reshape(n, w, n9)
            if off == 0:
                y9_ref[0:n, :, :] = contrib
            else:
                y9_ref[0:n, :, :] = y9_ref[0:n, :, :] + contrib
            off += cp

        chn = r1 - r0
        acc_ref[0:chn, :, :] = jnp.broadcast_to(
            bias_row.reshape(1, 1, co), (chn, w, co))
        for a in range(3):
            rmin = max(r0, 1 - a)          # out row r reads y row r+a-1
            rmax = min(r1, h + 1 - a)
            if rmin >= rmax:
                continue
            ya, yb = rmin + a - 1 - ylo, rmax + a - 1 - ylo
            for bb in range(3):
                g = a * 3 + bb
                wmin, wmax = max(0, 1 - bb), min(w, w + 1 - bb)
                acc_ref[rmin - r0:rmax - r0, wmin:wmax, :] = (
                    acc_ref[rmin - r0:rmax - r0, wmin:wmax, :]
                    + y9_ref[ya:yb, wmin + bb - 1:wmax + bb - 1,
                             g * co:(g + 1) * co])
        out_ref[0, r0:r1, :, :] = acc_ref[0:chn, :, :].astype(dt)


def _fwd_pallas(parts, k9, bias):
    b, h, w, _ = parts[0].shape
    cps = tuple(int(p.shape[-1]) for p in parts)
    cin, n9 = sum(cps), k9.shape[1]
    co = n9 // 9
    dt = parts[0].dtype
    in_specs = [pl.BlockSpec((1, h, w, cp), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM) for cp in cps]
    in_specs += [
        pl.BlockSpec((cin, n9), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cps=cps, h=h, w=w, co=co),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), dt),
        scratch_shapes=[
            pltpu.VMEM((_CHUNK + 2, w, n9), jnp.float32),
            pltpu.VMEM((_CHUNK, w, co), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(*parts, k9, bias.reshape(1, co))


# ---------------------------------------------------------------------------
# Backward kernels — MEASURED NEGATIVE, removed (see module docstring).
# The custom_vjp backward below re-derives the conv VJP through XLA instead:
# it is faster at every node and has no VMEM ceiling.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# custom_vjp op and public entry points
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _multipart_conv3x3(parts, k9, bias):
    return _fwd_pallas(tuple(parts), k9, bias)


def _mp_fwd(parts, k9, bias):
    return _fwd_pallas(tuple(parts), k9, bias), (tuple(parts), k9)


def _mp_bwd(res, g):
    """XLA backward: conv is linear, so the vjp of the reference formulation
    needs only (parts, kernel) — the unused primal output is DCE'd."""
    parts, k9 = res
    kernel = k9_to_kernel(k9)
    _, vjp = jax.vjp(
        lambda ps, kk, bb: reference_multipart_conv3x3(ps, kk, bb),
        tuple(parts), kernel, jnp.zeros((kernel.shape[-1],), k9.dtype))
    dparts, dkernel, dbias = vjp(g)
    return tuple(dparts), kernel_to_k9(dkernel), dbias


_multipart_conv3x3.defvjp(_mp_fwd, _mp_bwd)


def kernel_to_k9(kernel: jax.Array) -> jax.Array:
    """HWIO [3,3,Cin,Co] -> lane-packed [Cin, 9*Co], tap t=(a*3+b) column group."""
    kh, kw, cin, co = kernel.shape
    return kernel.transpose(2, 0, 1, 3).reshape(cin, kh * kw * co)


def k9_to_kernel(k9: jax.Array) -> jax.Array:
    """Inverse of kernel_to_k9: [Cin, 9*Co] -> HWIO [3,3,Cin,Co]."""
    cin, n9 = k9.shape
    co = n9 // 9
    return k9.reshape(cin, 3, 3, co).transpose(1, 2, 0, 3)


def fused_upcat_conv3x3(parts: Sequence[jax.Array], kernel: jax.Array,
                        bias: Optional[jax.Array] = None) -> jax.Array:
    """conv3x3(concat(parts, axis=-1)) + bias, fused on TPU when enabled.

    `parts` typically = [*skips, upsample2x(low)]; the upsample and the HWIO
    kernel reshape sit outside the custom_vjp boundary, so their gradients
    (matmul VJPs) come from XLA autodiff.
    """
    parts = list(parts)
    if not (_ENABLED and _supported(parts, kernel)):
        return reference_multipart_conv3x3(parts, kernel, bias)
    dt = parts[0].dtype
    co = kernel.shape[-1]
    k9 = kernel_to_k9(kernel).astype(dt)
    b = jnp.zeros((co,), dt) if bias is None else bias.astype(dt)
    return _multipart_conv3x3(tuple(parts), k9, b)
