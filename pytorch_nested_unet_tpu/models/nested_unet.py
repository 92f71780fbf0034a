"""NestedUNet (UNet++) — the flagship model. Reference: archs_backup.py:84-152.

Dense nested skip paths: node x_{i,j} = VGGBlock(concat(x_{i,0..j-1}, up(x_{i+1,j-1}))).
Deep supervision: four 1x1 heads on x0_1..x0_4 returning a list; else one head on x0_4.
NHWC; upsampling is bilinear x2 align_corners=True (archs_backup.py:93).
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import TorchConv
from ..ops.pool import max_pool2x2
from ..ops.resize import upsample2x
from .blocks import VGGBlock


class NestedUNet(nn.Module):
    num_classes: int = 1
    input_channels: int = 3
    deep_supervision: bool = False
    nb_filter: Sequence[int] = (32, 64, 128, 256, 512)
    # Rematerialization of the VGGBlocks in backward:
    #   False           — store every autodiff residual (fastest fwd, most HBM)
    #   True / "full"   — full per-block remat: recompute the whole block incl.
    #                     both convs (max memory saving, ~1.3x step FLOPs;
    #                     enables batch 512 on one v5e)
    #   "policy"        — save ONLY the conv outputs (checkpoint_name tags in
    #                     VGGBlock); BN/ReLU elementwise math is recomputed in
    #                     backward, convs never are.
    # Measured (v5e, wDS 96x96 bf16, img/s; batch-512 rows re-measured r05,
    # BENCH_DETAIL_r05_b512_{policy,full}.json):
    #   batch 16:  none 1061 | policy  964 | full  862
    #   batch 256: none 1878 | policy 1835 | full 1584
    #   batch 512: none OOM  | policy 1567 | full 1387
    # i.e. while the un-rematted program fits, XLA's own residual choice beats
    # both modes (its saved fused BN+ReLU outputs double as the next conv's
    # input, so forcing conv-only residuals ADDS traffic: 17.1->18.1 GB/step);
    # once HBM forces a remat, "policy" is ~13% faster than "full".
    remat: Any = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nb = self.nb_filter
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        # Decoder nodes hand VGGBlock the parts TUPLE (not a pre-concatenated
        # tensor): the first conv runs as MultipartConv3x3 — identical params
        # and math, but the Pallas decoder-fusion kernel can consume the parts
        # directly when enabled, so the concat never materializes in HBM.
        cat = lambda *ts: tuple(ts)
        if self.remat == "policy":
            import jax

            block_cls = nn.remat(
                VGGBlock, static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "vgg_conv1", "vgg_conv2"))
        elif self.remat in (True, "full"):
            block_cls = nn.remat(VGGBlock, static_argnums=(2,))
        elif self.remat in (False, None, "none"):
            block_cls = VGGBlock
        else:
            raise ValueError(f"remat must be False/True/'full'/'policy'/'none', "
                             f"got {self.remat!r}")

        def block(i, j, inputs):
            return block_cls(nb[i], nb[i], dtype=dt, name=f"conv{i}_{j}")(inputs, train)

        # Encoder column j=0 and nested grid (reference forward wiring :123-141).
        x0_0 = block(0, 0, x)
        x1_0 = block(1, 0, max_pool2x2(x0_0))
        x0_1 = block(0, 1, cat(x0_0, upsample2x(x1_0)))

        x2_0 = block(2, 0, max_pool2x2(x1_0))
        x1_1 = block(1, 1, cat(x1_0, upsample2x(x2_0)))
        x0_2 = block(0, 2, cat(x0_0, x0_1, upsample2x(x1_1)))

        x3_0 = block(3, 0, max_pool2x2(x2_0))
        x2_1 = block(2, 1, cat(x2_0, upsample2x(x3_0)))
        x1_2 = block(1, 2, cat(x1_0, x1_1, upsample2x(x2_1)))
        x0_3 = block(0, 3, cat(x0_0, x0_1, x0_2, upsample2x(x1_2)))

        x4_0 = block(4, 0, max_pool2x2(x3_0))
        x3_1 = block(3, 1, cat(x3_0, upsample2x(x4_0)))
        x2_2 = block(2, 2, cat(x2_0, x2_1, upsample2x(x3_1)))
        x1_3 = block(1, 3, cat(x1_0, x1_1, x1_2, upsample2x(x2_2)))
        x0_4 = block(0, 4, cat(x0_0, x0_1, x0_2, x0_3, upsample2x(x1_3)))

        if self.deep_supervision:
            # Four separate heads (reference :115-119, :143-148).
            outs = [
                TorchConv(self.num_classes, 1, dtype=dt, name=f"final{k}")(feat).astype(jnp.float32)
                for k, feat in zip((1, 2, 3, 4), (x0_1, x0_2, x0_3, x0_4))
            ]
            return outs
        out = TorchConv(self.num_classes, 1, dtype=dt, name="final")(x0_4)
        return out.astype(jnp.float32)
