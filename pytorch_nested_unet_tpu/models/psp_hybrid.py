"""UNetRNN + in-model CascadePSP refinement hybrids.

Reference: archs_backup.py:1397-1544 (UNetRNNCAttention_PSP — CAM-attended
UNetRNN whose forward refines h5 through a PSPNet cascade and returns
pred_224) and :1719-1849 (UNetRNNPSP — plain UNetRNN + RefinementModule via
process_high_res_im).

Documented divergences (SURVEY.md §7 quirk policy — rebuild the intent):
  - The reference constructs a FRESH random refinement network inside every
    forward call (archs_backup.py:1533-1537, :1842-1844), so it is untrained
    and the UNetRNNPSP variant even returns a numpy uint8 array, breaking
    autograd (eval-only by construction). Here the RefinementModule is a real
    flax submodule: trained end-to-end or loadable from the released
    CascadePSP weights via refinement.convert_torch_state_dict.
  - The in-model refinement runs the full-resolution 3-pass cascade (the
    global step); the sliding-window local step of process_high_res_im is a
    host-side driver (refinement/driver.py) and at the reference's 96-256 px
    protocol sizes (< L=900) it degenerates to the global pass anyway
    (eval_helper.py:56-66).
  - Requires num_classes == 1 (the refinement trunk's 6-channel stem takes
    image + 3 seg channels, extractors.py:57) — the reference crashes for
    any other value too.

Output: refined probability map `pred_224` (values in [0,1]) at input
resolution, like the reference returns (archs_backup.py:1540).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..refinement.pspnet import RefinementModule
from .dual_attention import CAMModule
from .rdc import RDC, _UNetRNNBase, rdc_decode


class _UNetRNNWithPSP(_UNetRNNBase):
    """Shared tail: RDC decode -> RefinementModule(im, h5) -> pred_224."""

    attend_cam: bool = False

    def attend(self, scores, train):
        if not self.attend_cam:
            return scores
        return [CAMModule(name=f"CAM_Module{i + 1}")(s) for i, s in enumerate(scores)]

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.num_classes != 1:
            raise ValueError("PSP-hybrid models require num_classes=1 "
                             "(6-channel refinement stem, extractors.py:57)")
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = self.encode(x, train)
        scores = self.attend(self.score(feats, train), train)
        rdc = RDC(self.num_classes, self.kernel_size, use_bias=self.use_bias,
                  decoder=self.decoder, dtype=self.dtype, name="RDC")
        h5 = rdc_decode(rdc, scores, self.decoder)

        images = RefinementModule(dtype=self.dtype, name="psp")(x, h5, train=train)
        return images["pred_224"].astype(jnp.float32)


class UNetRNNCAttention_PSP(_UNetRNNWithPSP):
    """CAM-attended UNetRNN + cascade refinement
    (reference archs_backup.py:1397-1544)."""

    attend_cam: bool = True


class UNetRNNPSP(_UNetRNNWithPSP):
    """UNetRNN + cascade refinement (reference archs_backup.py:1719-1849)."""

    attend_cam: bool = False
