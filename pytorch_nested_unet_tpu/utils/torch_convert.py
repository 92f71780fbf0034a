"""torch state_dict -> flax variables converter for the flagship models.

Lets a user of the reference bring reference-trained `model.pth` weights
(UNet / NestedUNet, reference archs_backup.py:46-152, saved by trains.py:344-349)
into this framework for inference or fine-tuning — the "config capsule +
weights" migration path (SURVEY.md §5 checkpoint/resume).

Mapping is mechanical because module names match the reference's attribute
names by design: `conv0_0.conv1.weight` -> params/conv0_0/conv1/conv/kernel
(OIHW->HWIO), `conv0_0.bn1.{weight,bias,running_mean,running_var}` ->
params/conv0_0/bn1/{scale,bias} + batch_stats/conv0_0/bn1/{mean,var}.
Works for any model here whose torch counterpart uses named attributes (not
nn.Sequential indices) — the UNet/NestedUNet family; the CascadePSP network
has its own converter (refinement.convert_torch_state_dict).
"""

import re
from typing import Any, Dict

import numpy as np

_BN_LEAVES = {"weight": "scale", "bias": "bias",
              "running_mean": "mean", "running_var": "var"}

# The CRDN/UNetRNN reference defs (reference finished/archs1.py:214-360,
# CRDN.py:78-199) break the named-attribute convention in exactly three ways:
# the 5th encoder block is attribute `center` (ours: conv5), unetConv2 wraps
# each conv in an indexed nn.Sequential (`conv1.conv1.0.weight` = conv,
# `.1.` = bn), and the score blocks are bare Sequentials
# (`score_block1.0.weight`).  These rename tables bridge torch's index-style
# keys to the attribute-style keys the mechanical converter expects; the RDC
# gate convs (RDC.gru_catconv/...) already match by name.
_CRDN_TO_ATTR = (
    (re.compile(r"^center\."), "conv5."),
    (re.compile(r"^(conv\d)\.conv([12])\.0\."), r"\1.conv\2."),
    (re.compile(r"^(conv\d)\.conv([12])\.1\."), r"\1.bn\2."),
    (re.compile(r"^(score_block\d)\.0\."), r"\1.conv."),
    (re.compile(r"^(score_block\d)\.1\."), r"\1.bn."),
)
_ATTR_TO_CRDN = (
    (re.compile(r"^(conv\d)\.conv([12])\."), r"\1.conv\2.0."),
    (re.compile(r"^(conv\d)\.bn([12])\."), r"\1.conv\2.1."),
    (re.compile(r"^(score_block\d)\.conv\."), r"\1.0."),
    (re.compile(r"^(score_block\d)\.bn\."), r"\1.1."),
)
# Only UNetRNN names its 5th (deepest) encoder block `center` (reference
# finished/archs1.py:232, archs_backup.py:261); the RM3/RM7 depth ablations
# use plain conv1..N throughout (archs_backup.py:637-643, 734-752), so for
# UNetRM7 a blanket conv5->center rename would corrupt a real encoder block.
_CENTER_EXPORT = ((re.compile(r"^conv5\."), "center."),)


# UNetRNNGhost (reference archs_backup.py:505-616) wraps each GhostBottleneck
# score block in a one-element nn.Sequential (`score_blockN.0.<ghost tree>`)
# and keys the ghost/shortcut convs through indexed Sequentials
# (primary_conv.{0,1}, cheap_operation.{0,1}, shortcut.{0..3}).  These rules
# bridge to this framework's named ghost modules (models/ghost.py); they are
# applied BEFORE the CRDN rules so the bare `score_blockN.0.` -> `.conv.`
# rename never sees a ghost key.
_GHOST_TO_ATTR = (
    (re.compile(r"^(score_block\d)\.0\.(ghost[12])\.primary_conv\.0\."),
     r"\1.\2.primary_conv."),
    (re.compile(r"^(score_block\d)\.0\.(ghost[12])\.primary_conv\.1\."),
     r"\1.\2.primary_bn.bn."),
    (re.compile(r"^(score_block\d)\.0\.(ghost[12])\.cheap_operation\.0\."),
     r"\1.\2.cheap_conv."),
    (re.compile(r"^(score_block\d)\.0\.(ghost[12])\.cheap_operation\.1\."),
     r"\1.\2.cheap_bn.bn."),
    (re.compile(r"^(score_block\d)\.0\.se\."), r"\1.se."),
    (re.compile(r"^(score_block\d)\.0\.shortcut\.0\."), r"\1.shortcut_dw."),
    (re.compile(r"^(score_block\d)\.0\.shortcut\.1\."), r"\1.shortcut_dw_bn.bn."),
    (re.compile(r"^(score_block\d)\.0\.shortcut\.2\."), r"\1.shortcut_pw."),
    (re.compile(r"^(score_block\d)\.0\.shortcut\.3\."), r"\1.shortcut_pw_bn.bn."),
)
_ATTR_TO_GHOST = (
    (re.compile(r"^(score_block\d)\.(ghost[12])\.primary_conv\."),
     r"\1.0.\2.primary_conv.0."),
    (re.compile(r"^(score_block\d)\.(ghost[12])\.primary_bn\.bn\."),
     r"\1.0.\2.primary_conv.1."),
    (re.compile(r"^(score_block\d)\.(ghost[12])\.cheap_conv\."),
     r"\1.0.\2.cheap_operation.0."),
    (re.compile(r"^(score_block\d)\.(ghost[12])\.cheap_bn\.bn\."),
     r"\1.0.\2.cheap_operation.1."),
    (re.compile(r"^(score_block\d)\.se\."), r"\1.0.se."),
    (re.compile(r"^(score_block\d)\.shortcut_dw\."), r"\1.0.shortcut.0."),
    (re.compile(r"^(score_block\d)\.shortcut_dw_bn\.bn\."), r"\1.0.shortcut.1."),
    (re.compile(r"^(score_block\d)\.shortcut_pw\."), r"\1.0.shortcut.2."),
    (re.compile(r"^(score_block\d)\.shortcut_pw_bn\.bn\."), r"\1.0.shortcut.3."),
)


# The LeeJunHyun attention-UNet family (reference archs.py:29-46 conv_block,
# :1244-1321 up_conv/Recurrent_block/RRCNN_block/Attention_block,
# :1322-1474 R2AttU_Net/AttU_Net) also keys through indexed Sequentials:
# conv_block is `*.conv.{0,1,3,4}.*` (conv,bn,conv,bn), up_conv is
# `*.up.{1,2}.*`, the gates are `*.{W_g,W_x,psi}.{0,1}.*`, and RRCNN blocks
# are `*.RCNN.{0,1}.conv.{0,1}.*` plus an inner `Conv_1x1`.
# BN targets carry a trailing `.bn.` segment: these models build their norms
# from ops.layers.BatchNorm, whose params live one scope deeper
# (`<name>/bn/{scale,bias}`) than the flat FusedBatchNormReLU layout the
# flagship family uses.
_ATTN_TO_ATTR = (
    (re.compile(r"\.RCNN\.0\.conv\.0\."), ".rcnn1.conv."),
    (re.compile(r"\.RCNN\.0\.conv\.1\."), ".rcnn1.bn.bn."),
    (re.compile(r"\.RCNN\.1\.conv\.0\."), ".rcnn2.conv."),
    (re.compile(r"\.RCNN\.1\.conv\.1\."), ".rcnn2.bn.bn."),
    (re.compile(r"^((?:Up_)?RRCNN\d)\.Conv_1x1\."), r"\1.conv_1x1."),
    (re.compile(r"\.conv\.0\."), ".conv1."),
    (re.compile(r"\.conv\.1\."), ".bn1.bn."),
    (re.compile(r"\.conv\.3\."), ".conv2."),
    (re.compile(r"\.conv\.4\."), ".bn2.bn."),
    (re.compile(r"\.up\.1\."), ".conv."),
    (re.compile(r"\.up\.2\."), ".bn.bn."),
    (re.compile(r"\.(W_g|W_x|psi)\.0\."), r".\1_conv."),
    (re.compile(r"\.(W_g|W_x|psi)\.1\."), r".\1_bn.bn."),
)
_ATTR_TO_ATTN = (
    (re.compile(r"\.rcnn1\.conv\."), ".RCNN.0.conv.0."),
    (re.compile(r"\.rcnn1\.bn\.bn\."), ".RCNN.0.conv.1."),
    (re.compile(r"\.rcnn2\.conv\."), ".RCNN.1.conv.0."),
    (re.compile(r"\.rcnn2\.bn\.bn\."), ".RCNN.1.conv.1."),
    (re.compile(r"^((?:Up_)?RRCNN\d)\.conv_1x1\."), r"\1.Conv_1x1."),
    (re.compile(r"\.conv1\."), ".conv.0."),
    (re.compile(r"\.bn1\.bn\."), ".conv.1."),
    (re.compile(r"\.conv2\."), ".conv.3."),
    (re.compile(r"\.bn2\.bn\."), ".conv.4."),
    (re.compile(r"\.(W_g|W_x|psi)_conv\."), r".\1.0."),
    (re.compile(r"\.(W_g|W_x|psi)_bn\.bn\."), r".\1.1."),
    (re.compile(r"^(Up\d)\.conv\."), r"\1.up.1."),
    (re.compile(r"^(Up\d)\.bn\.bn\."), r"\1.up.2."),
)


# CRDN backbone family (reference CRDN.py:250-908).  The torch side keys
# through torchvision-style nested Sequentials: residual stages are
# `layer{L}.{i}.<convN|bnN|downsample.{0,1}>`, VGG blocks interleave
# MaxPool/Conv/BN/ReLU inside one Sequential, the FCN classifier is a
# 9-element Sequential, and unetUp wraps a no-BN unetConv2
# (`up_concatK.conv.convN.0`).  Our flax scopes flatten stage blocks to
# `encoder/layer{L}_{i}` (models/crdn_backbones.py) and use ops.layers
# BatchNorm (params one scope deeper: `<name>.bn.`).  Two reference
# attributes are constructed but never used by any forward and are dropped
# on import: the `fc` classifier head (CRDN.py:440/696/802) and VGG16RNN's
# trailing `score` conv (CRDN.py:353).
_RESNET_ENC_TO_ATTR = (
    (re.compile(r"^conv1\."), "encoder.conv1."),
    (re.compile(r"^bn1\."), "encoder.bn1.bn."),
    (re.compile(r"^layer(\d)\.(\d+)\.downsample\.0\."),
     r"encoder.layer\1_\2.downsample_conv."),
    (re.compile(r"^layer(\d)\.(\d+)\.downsample\.1\."),
     r"encoder.layer\1_\2.downsample_bn.bn."),
    (re.compile(r"^layer(\d)\.(\d+)\.bn(\d)\."), r"encoder.layer\1_\2.bn\3.bn."),
    (re.compile(r"^layer(\d)\.(\d+)\.conv(\d)\."), r"encoder.layer\1_\2.conv\3."),
)
_ATTR_TO_RESNET_ENC = (
    (re.compile(r"^encoder\.conv1\."), "conv1."),
    (re.compile(r"^encoder\.bn1\.bn\."), "bn1."),
    (re.compile(r"^encoder\.layer(\d)_(\d+)\.downsample_conv\."),
     r"layer\1.\2.downsample.0."),
    (re.compile(r"^encoder\.layer(\d)_(\d+)\.downsample_bn\.bn\."),
     r"layer\1.\2.downsample.1."),
    (re.compile(r"^encoder\.layer(\d)_(\d+)\.bn(\d)\.bn\."), r"layer\1.\2.bn\3."),
    (re.compile(r"^encoder\.layer(\d)_(\d+)\.conv(\d)\."), r"layer\1.\2.conv\3."),
)
_RESNET_SCORE_TO_ATTR = (
    (re.compile(r"^(conv\d_score_block)\.0\."), r"\1.conv."),
    (re.compile(r"^(conv\d_score_block)\.1\."), r"\1.bn."),
)
_ATTR_TO_RESNET_SCORE = (
    (re.compile(r"^(conv\d_score_block)\.conv\."), r"\1.0."),
    (re.compile(r"^(conv\d_score_block)\.bn\."), r"\1.1."),
)
# VGG16RNN conv blocks (CRDN.py:260-316): block1 is [conv,bn,relu]x2 (convs
# at Sequential indices 0/3), blocks 2-5 lead with a MaxPool (convs at
# 1/4/7); our scopes are conv_block{b}_{i} ConvBNReLU units.
_VGG_RNN_TO_ATTR = (
    (re.compile(r"^conv_block1\.0\."), "conv_block1_0.conv."),
    (re.compile(r"^conv_block1\.1\."), "conv_block1_0.bn."),
    (re.compile(r"^conv_block1\.3\."), "conv_block1_1.conv."),
    (re.compile(r"^conv_block1\.4\."), "conv_block1_1.bn."),
    (re.compile(r"^conv_block([2-5])\.1\."), r"conv_block\1_0.conv."),
    (re.compile(r"^conv_block([2-5])\.2\."), r"conv_block\1_0.bn."),
    (re.compile(r"^conv_block([2-5])\.4\."), r"conv_block\1_1.conv."),
    (re.compile(r"^conv_block([2-5])\.5\."), r"conv_block\1_1.bn."),
    (re.compile(r"^conv_block([3-5])\.7\."), r"conv_block\1_2.conv."),
    (re.compile(r"^conv_block([3-5])\.8\."), r"conv_block\1_2.bn."),
    (re.compile(r"^(score_block\d)\.0\."), r"\1.conv."),
    (re.compile(r"^(score_block\d)\.1\."), r"\1.bn."),
)
_ATTR_TO_VGG_RNN = (
    (re.compile(r"^conv_block1_0\.conv\."), "conv_block1.0."),
    (re.compile(r"^conv_block1_0\.bn\."), "conv_block1.1."),
    (re.compile(r"^conv_block1_1\.conv\."), "conv_block1.3."),
    (re.compile(r"^conv_block1_1\.bn\."), "conv_block1.4."),
    (re.compile(r"^conv_block([2-5])_0\.conv\."), r"conv_block\1.1."),
    (re.compile(r"^conv_block([2-5])_0\.bn\."), r"conv_block\1.2."),
    (re.compile(r"^conv_block([2-5])_1\.conv\."), r"conv_block\1.4."),
    (re.compile(r"^conv_block([2-5])_1\.bn\."), r"conv_block\1.5."),
    (re.compile(r"^conv_block([3-5])_2\.conv\."), r"conv_block\1.7."),
    (re.compile(r"^conv_block([3-5])_2\.bn\."), r"conv_block\1.8."),
    (re.compile(r"^(score_block\d)\.conv\."), r"\1.0."),
    (re.compile(r"^(score_block\d)\.bn\."), r"\1.1."),
)
# ResNetUNet decoder: unetUp.conv is unetConv2(is_batchnorm=False) —
# one-element Sequentials around each conv (CRDN.py:753-772, :213-214).
# The ConvTranspose `up` passes through the generic converter: torch
# (cin, cout, kh, kw) -> transpose(2,3,1,0) = flax transpose_kernel
# (kh, kw, cout, cin), the same permutation a regular conv uses.
_RESNET_UNET_TO_ATTR = (
    (re.compile(r"^(up_concat\d)\.conv\.conv([12])\.0\."), r"\1.conv.conv\2."),
)
_ATTR_TO_RESNET_UNET = (
    (re.compile(r"^(up_concat\d)\.conv\.conv([12])\."), r"\1.conv.conv\2.0."),
)
# ResNetFCN classifier Sequential (CRDN.py:804-814): conv/bn/relu/drop x2 + conv.
_FCN_TO_ATTR = (
    (re.compile(r"^classifier\.0\."), "classifier_conv1."),
    (re.compile(r"^classifier\.1\."), "classifier_bn1.bn."),
    (re.compile(r"^classifier\.4\."), "classifier_conv2."),
    (re.compile(r"^classifier\.5\."), "classifier_bn2.bn."),
    (re.compile(r"^classifier\.8\."), "classifier_conv3."),
)
_ATTR_TO_FCN = (
    (re.compile(r"^classifier_conv1\."), "classifier.0."),
    (re.compile(r"^classifier_bn1\.bn\."), "classifier.1."),
    (re.compile(r"^classifier_conv2\."), "classifier.4."),
    (re.compile(r"^classifier_bn2\.bn\."), "classifier.5."),
    (re.compile(r"^classifier_conv3\."), "classifier.8."),
)
_RESNET_DEAD = (re.compile(r"^fc\."),)
_VGG_DEAD = (re.compile(r"^score\."),)

# CA-Net / Comprehensive_Atten_Unet (reference archs.py:844-959).  The torch
# side keys through: conv_block Sequentials (`convN.conv.{0,1,3,4}`), grid
# attention gates with `W` Sequentials (`attentionblockN.gate_block_K.W.{0,1}`)
# and `combine_gates.{0,1}`, the non-local block's wrapped g/phi/W
# (`nonlocal4_2.{g,phi,W}.0` + `W.1` BN), SE blocks with Linear fc1/fc2 and a
# `downchannel` Sequential, deep-supervision heads (`dsvN.dsv.0`), the CBAM
# scale-attention tree (`scale_att.cbam.{ChannelGate.mlp.{1,3},
# SpatialGate.conv{1,2}.{conv,bn}}`) and a `final.{0}` Sequential.  Our flax
# scopes keep the reference's attribute names (models/canet.py) with
# ops.layers.BatchNorm one scope deeper (`.bn.`) except where the flax model
# uses nn.BatchNorm directly (nonlocal W_bn, SpatialAtten conv1_bn).  Linear
# layers ride the generic 2D-weight -> dense path.
_CANET_TO_ATTR = (
    (re.compile(r"^scale_att\.cbam\.ChannelGate\.mlp\.1\."),
     "scale_att.channel_gate.fc1."),
    (re.compile(r"^scale_att\.cbam\.ChannelGate\.mlp\.3\."),
     "scale_att.channel_gate.fc2."),
    (re.compile(r"^scale_att\.cbam\.SpatialGate\.conv1\.conv\."),
     "scale_att.spatial_gate.conv1_conv."),
    (re.compile(r"^scale_att\.cbam\.SpatialGate\.conv1\.bn\."),
     "scale_att.spatial_gate.conv1_bn."),
    (re.compile(r"^scale_att\.cbam\.SpatialGate\.conv2\.conv\."),
     "scale_att.spatial_gate.conv2_conv."),
    (re.compile(r"^scale_att\.bn3\."), "scale_att.bn3.bn."),
    (re.compile(r"^nonlocal4_2\.g\.0\."), "nonlocal4_2.g."),
    (re.compile(r"^nonlocal4_2\.phi\.0\."), "nonlocal4_2.phi."),
    (re.compile(r"^nonlocal4_2\.W\.0\."), "nonlocal4_2.W_conv."),
    (re.compile(r"^nonlocal4_2\.W\.1\."), "nonlocal4_2.W_bn."),
    (re.compile(r"^(attentionblock\d\.gate_block_\d)\.W\.0\."), r"\1.W_conv."),
    (re.compile(r"^(attentionblock\d\.gate_block_\d)\.W\.1\."), r"\1.W_bn.bn."),
    (re.compile(r"^(attentionblock\d)\.combine_gates\.0\."), r"\1.combine_conv."),
    (re.compile(r"^(attentionblock\d)\.combine_gates\.1\."), r"\1.combine_bn.bn."),
    (re.compile(r"^(up\d)\.bn(\d)\."), r"\1.bn\2.bn."),
    (re.compile(r"^(up\d)\.downchannel\.0\."), r"\1.downchannel_conv."),
    (re.compile(r"^(up\d)\.downchannel\.1\."), r"\1.downchannel_bn.bn."),
    (re.compile(r"^(dsv\d)\.dsv\.0\."), r"\1.conv."),
    (re.compile(r"^final\.0\."), "final."),
    (re.compile(r"^((?:conv\d|center))\.conv\.0\."), r"\1.conv1."),
    (re.compile(r"^((?:conv\d|center))\.conv\.1\."), r"\1.bn1.bn."),
    (re.compile(r"^((?:conv\d|center))\.conv\.3\."), r"\1.conv2."),
    (re.compile(r"^((?:conv\d|center))\.conv\.4\."), r"\1.bn2.bn."),
)
_ATTR_TO_CANET = (
    (re.compile(r"^scale_att\.channel_gate\.fc1\."),
     "scale_att.cbam.ChannelGate.mlp.1."),
    (re.compile(r"^scale_att\.channel_gate\.fc2\."),
     "scale_att.cbam.ChannelGate.mlp.3."),
    (re.compile(r"^scale_att\.spatial_gate\.conv1_conv\."),
     "scale_att.cbam.SpatialGate.conv1.conv."),
    (re.compile(r"^scale_att\.spatial_gate\.conv1_bn\."),
     "scale_att.cbam.SpatialGate.conv1.bn."),
    (re.compile(r"^scale_att\.spatial_gate\.conv2_conv\."),
     "scale_att.cbam.SpatialGate.conv2.conv."),
    (re.compile(r"^scale_att\.bn3\.bn\."), "scale_att.bn3."),
    (re.compile(r"^nonlocal4_2\.g\."), "nonlocal4_2.g.0."),
    (re.compile(r"^nonlocal4_2\.phi\."), "nonlocal4_2.phi.0."),
    (re.compile(r"^nonlocal4_2\.W_conv\."), "nonlocal4_2.W.0."),
    (re.compile(r"^nonlocal4_2\.W_bn\."), "nonlocal4_2.W.1."),
    (re.compile(r"^(attentionblock\d\.gate_block_\d)\.W_conv\."), r"\1.W.0."),
    (re.compile(r"^(attentionblock\d\.gate_block_\d)\.W_bn\.bn\."), r"\1.W.1."),
    (re.compile(r"^(attentionblock\d)\.combine_conv\."), r"\1.combine_gates.0."),
    (re.compile(r"^(attentionblock\d)\.combine_bn\.bn\."), r"\1.combine_gates.1."),
    (re.compile(r"^(up\d)\.bn(\d)\.bn\."), r"\1.bn\2."),
    (re.compile(r"^(up\d)\.downchannel_conv\."), r"\1.downchannel.0."),
    (re.compile(r"^(up\d)\.downchannel_bn\.bn\."), r"\1.downchannel.1."),
    (re.compile(r"^(dsv\d)\.conv\."), r"\1.dsv.0."),
    (re.compile(r"^final\."), "final.0."),
    (re.compile(r"^((?:conv\d|center))\.conv1\."), r"\1.conv.0."),
    (re.compile(r"^((?:conv\d|center))\.bn1\.bn\."), r"\1.conv.1."),
    (re.compile(r"^((?:conv\d|center))\.conv2\."), r"\1.conv.3."),
    (re.compile(r"^((?:conv\d|center))\.bn2\.bn\."), r"\1.conv.4."),
)


def _rename(key: str, rules) -> str:
    for pat, repl in rules:
        key = pat.sub(repl, key)
    return key


def convert_crdn_state_dict(state_dict: Dict[str, Any]):
    """CRDN-family torch state_dict (reference finished/archs1.py UNetRNN /
    CRDN.py naming) -> flax variables, via the index->attribute rename."""
    renamed = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        renamed[_rename(k, _CRDN_TO_ATTR)] = v
    return convert_reference_state_dict(renamed)


def export_crdn_state_dict(variables, center: bool = True) -> Dict[str, np.ndarray]:
    """Inverse of convert_crdn_state_dict: flax variables -> the reference's
    CRDN index-style torch state_dict. `center` renames conv5 -> center
    (UNetRNN only; False for the RM3/RM7 depth ablations)."""
    rules = _ATTR_TO_CRDN + (_CENTER_EXPORT if center else ())
    return {_rename(k, rules): v
            for k, v in export_reference_state_dict(variables).items()}


def export_rm_state_dict(variables) -> Dict[str, np.ndarray]:
    """UNetRM3/UNetRM7 export: conv1..N stay conv1..N (no `center`)."""
    return export_crdn_state_dict(variables, center=False)


def convert_ghost_state_dict(state_dict: Dict[str, Any]):
    """UNetRNNGhost torch state_dict (reference archs_backup.py:505-616)
    -> flax variables: ghost-score-block renames, then the CRDN renames
    for the shared encoder."""
    renamed = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        renamed[_rename(k, _GHOST_TO_ATTR + _CRDN_TO_ATTR)] = v
    return convert_reference_state_dict(renamed)


def export_ghost_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_ghost_state_dict."""
    rules = _ATTR_TO_GHOST + _ATTR_TO_CRDN + _CENTER_EXPORT
    return {_rename(k, rules): v
            for k, v in export_reference_state_dict(variables).items()}


def _convert_with(state_dict: Dict[str, Any], rules, dead=()):
    renamed = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if any(p.match(k) for p in dead):
            continue  # documented dead reference attribute (never forwarded)
        renamed[_rename(k, rules)] = v
    return convert_reference_state_dict(renamed)


def convert_resnet_rnn_state_dict(state_dict: Dict[str, Any]):
    """ResNet{50,101,152}RNN torch state_dict (reference CRDN.py:418-587,
    factories :886-898) -> flax variables.  ResNet18/34RNN share the key
    layout but the reference classes cannot produce checkpoints: their
    hardcoded Bottleneck score-block channels (CRDN.py:449-478) crash every
    BasicBlock forward, so only shape validation can succeed for them."""
    return _convert_with(state_dict, _RESNET_SCORE_TO_ATTR + _RESNET_ENC_TO_ATTR,
                         _RESNET_DEAD)


def export_resnet_rnn_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_resnet_rnn_state_dict (the dead `fc` head and the
    inactive RDC gate convs have no flax params and are not synthesized)."""
    rules = _ATTR_TO_RESNET_SCORE + _ATTR_TO_RESNET_ENC
    return {_rename(k, rules): v
            for k, v in export_reference_state_dict(variables).items()}


def convert_vgg_rnn_state_dict(state_dict: Dict[str, Any]):
    """VGG16RNN torch state_dict (reference CRDN.py:250-407) -> flax."""
    return _convert_with(state_dict, _VGG_RNN_TO_ATTR, _VGG_DEAD)


def export_vgg_rnn_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_vgg_rnn_state_dict (dead `score` conv omitted)."""
    return {_rename(k, _ATTR_TO_VGG_RNN): v
            for k, v in export_reference_state_dict(variables).items()}


def convert_resnet_unet_state_dict(state_dict: Dict[str, Any]):
    """ResNet50UNet torch state_dict (reference CRDN.py:674-772) -> flax."""
    return _convert_with(state_dict, _RESNET_UNET_TO_ATTR + _RESNET_ENC_TO_ATTR,
                         _RESNET_DEAD)


def export_resnet_unet_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_resnet_unet_state_dict."""
    rules = _ATTR_TO_RESNET_UNET + _ATTR_TO_RESNET_ENC
    return {_rename(k, rules): v
            for k, v in export_reference_state_dict(variables).items()}


def convert_resnet_fcn_state_dict(state_dict: Dict[str, Any]):
    """ResNet50FCN torch state_dict (reference CRDN.py:781-872) -> flax."""
    return _convert_with(state_dict, _FCN_TO_ATTR + _RESNET_ENC_TO_ATTR,
                         _RESNET_DEAD)


def export_resnet_fcn_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_resnet_fcn_state_dict."""
    rules = _ATTR_TO_FCN + _ATTR_TO_RESNET_ENC
    return {_rename(k, rules): v
            for k, v in export_reference_state_dict(variables).items()}


def convert_canet_state_dict(state_dict: Dict[str, Any]):
    """Comprehensive_Atten_Unet (CA-Net) torch state_dict (reference
    archs.py:844-959) -> flax variables."""
    return _convert_with(state_dict, _CANET_TO_ATTR)


def export_canet_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_canet_state_dict."""
    return {_rename(k, _ATTR_TO_CANET): v
            for k, v in export_reference_state_dict(variables).items()}


def export_psp_hybrid_state_dict(variables) -> Dict[str, np.ndarray]:
    """UNetRNNCAttention_PSP / UNetRNNPSP flax variables -> reference torch
    state_dict (archs_backup.py:1397-1544, :1719-1849).  The reference builds
    its refinement PSPNet INSIDE forward (archs_backup.py:1533-1537,
    :1842-1844), so its state_dict carries only the CRDN trunk (+ CAM gammas
    for the CAttention variant) — the `psp` submodule is dropped on export."""
    trunk = {coll: {k: v for k, v in variables[coll].items() if k != "psp"}
             for coll in ("params", "batch_stats")}
    return export_crdn_state_dict(trunk)


def convert_attention_unet_state_dict(state_dict: Dict[str, Any]):
    """AttU_Net / R2U_Net / R2AttU_Net torch state_dict (reference
    archs.py:1322-1474 naming) -> flax variables."""
    renamed = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        renamed[_rename(k, _ATTN_TO_ATTR)] = v
    return convert_reference_state_dict(renamed)


def export_attention_unet_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_attention_unet_state_dict."""
    return {_rename(k, _ATTR_TO_ATTN): v
            for k, v in export_reference_state_dict(variables).items()}


def converters_for_arch(arch: str):
    """(torch->flax, flax->torch) converter pair for a registry arch name.

    The flagship family keys by named attributes and needs no shim; the CRDN
    and attention-UNet families need the index->attribute renames above."""
    if arch in ("UNetRNN", "UNetRNNCAttention", "UNetRNNAttention",
                "UNetRNNPAttention"):
        # The dual-attention variants share UNetRNN's CRDN key layout plus
        # gamma leaves, which the generic converter handles:
        #   - UNetRNNCAttention round-trips fully (CAM_Module{i}.gamma).
        #   - UNetRNNAttention: the reference builds its PAM/CAM modules
        #     inside forward (archs_backup.py:950-962), so its checkpoints
        #     carry NO attention params; convert.py synthesizes gamma=0
        #     init-equivalents (bitwise-identical semantics at gamma=0).
        #   - UNetRNNPAttention: reference checkpoints cannot exist — its
        #     PAM convs are built with filters[i] channels but applied to
        #     n_classes-channel maps (archs_backup.py:997-1001 vs
        #     :1053-1067), so every forward crashes; a conversion attempt
        #     fails loudly at shape validation.
        return convert_crdn_state_dict, export_crdn_state_dict
    if arch in ("UNetRNNCAttention_PSP", "UNetRNNPSP"):
        # CRDN trunk (+ CAM gammas) in the checkpoint; the reference's
        # refinement net is a fresh random PSPNet built inside every forward
        # (archs_backup.py:1533-1537, :1842-1844) and never checkpointed —
        # convert.py synthesizes the `psp` subtree (or grafts released
        # CascadePSP weights via --refine_pth); export drops it.
        return convert_crdn_state_dict, export_psp_hybrid_state_dict
    if arch in ("UNetRM3", "UNetRM7"):
        return convert_crdn_state_dict, export_rm_state_dict
    if arch in ("UNetRNNGhost",):
        return convert_ghost_state_dict, export_ghost_state_dict
    if arch in ("AttU_Net", "R2U_Net", "R2AttU_Net"):
        return (convert_attention_unet_state_dict,
                export_attention_unet_state_dict)
    if arch in ("Comprehensive_Atten_Unet",):
        return convert_canet_state_dict, export_canet_state_dict
    if arch in ("ResNetRNN", "ResNet18RNN", "ResNet34RNN", "ResNet50RNN",
                "ResNet101RNN", "ResNet152RNN"):
        return convert_resnet_rnn_state_dict, export_resnet_rnn_state_dict
    if arch in ("VGG16RNN",):
        return convert_vgg_rnn_state_dict, export_vgg_rnn_state_dict
    if arch in ("ResNetUNet", "ResNet50UNet"):
        return convert_resnet_unet_state_dict, export_resnet_unet_state_dict
    if arch in ("ResNetFCN", "ResNet50FCN"):
        return convert_resnet_fcn_state_dict, export_resnet_fcn_state_dict
    return convert_reference_state_dict, export_reference_state_dict


def _as_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def convert_reference_state_dict(state_dict: Dict[str, Any]):
    """Convert a torch state_dict (tensors or arrays; optional DataParallel
    'module.' prefixes) into {'params': ..., 'batch_stats': ...}."""
    params: Dict = {}
    stats: Dict = {}

    def insert(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        parts = key.split(".")
        leaf = parts[-1]
        mods = parts[:-1]
        if leaf == "num_batches_tracked":
            continue
        arr = _as_numpy(value)
        # conv weight is 4D; a 1D bias belongs to a conv iff its sibling
        # weight is 4D; everything else 1D is batch-norm affine/stats
        if leaf == "gamma":
            # PAM/CAM residual gate scalar (reference archs_backup.py:884,921)
            insert(params, tuple(mods) + ("gamma",), arr)
        elif leaf == "weight" and arr.ndim == 4:
            insert(params, tuple(mods) + ("conv", "kernel"),
                   arr.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        elif leaf == "weight" and arr.ndim == 2:
            # torch nn.Linear (out, in) -> flax Dense kernel (in, out)
            insert(params, tuple(mods) + ("dense", "kernel"), arr.T)
        elif leaf == "bias" and _sibling_weight_ndim(state_dict, mods) == 4:
            insert(params, tuple(mods) + ("conv", "bias"), arr)
        elif leaf == "bias" and _sibling_weight_ndim(state_dict, mods) == 2:
            insert(params, tuple(mods) + ("dense", "bias"), arr)
        elif leaf in ("weight", "bias"):
            insert(params, tuple(mods) + (_BN_LEAVES[leaf],), arr)
        elif leaf in ("running_mean", "running_var"):
            insert(stats, tuple(mods) + (_BN_LEAVES[leaf],), arr)
        else:
            raise KeyError(f"unrecognized torch key: {key}")
    return {"params": params, "batch_stats": stats}


def _sibling_weight_ndim(state_dict, mods):
    """ndim of the `.weight` beside a `.bias`: 4 = conv, 2 = linear,
    1 = batch-norm affine, None = no sibling."""
    for prefix in (".".join(mods), "module." + ".".join(mods)):
        w = state_dict.get(prefix + ".weight")
        if w is not None:
            return _as_numpy(w).ndim
    return None


def export_reference_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse: flax variables -> torch-style state_dict (round-trip/interop)."""
    out: Dict[str, np.ndarray] = {}

    def walk(tree, path, collection):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,), collection)
                continue
            arr = np.asarray(v)
            if k == "gamma":  # PAM/CAM residual gate scalar
                out[".".join(path) + ".gamma"] = arr
            elif path and path[-1] == "dense":
                base = ".".join(path[:-1])
                if k == "kernel":  # flax (in, out) -> torch Linear (out, in)
                    out[base + ".weight"] = arr.T
                else:
                    out[base + ".bias"] = arr
            elif path and path[-1] == "conv" or (k == "kernel"):
                base = ".".join(path[:-1] if path[-1] == "conv" else path)
                if k == "kernel":
                    out[base + ".weight"] = arr.transpose(3, 2, 0, 1)
                else:
                    out[base + ".bias"] = arr
            else:
                base = ".".join(path)
                name = {"scale": "weight", "bias": "bias",
                        "mean": "running_mean", "var": "running_var"}[k]
                out[base + "." + name] = arr

    walk(variables["params"], (), "params")
    walk(variables.get("batch_stats", {}), (), "stats")
    return out
