"""Model zoo + registry.

The reference builds models by module-dict lookup:
`archs.__dict__[config['arch']](num_classes, input_channels, deep_supervision)`
(reference trains.py:219-221). We keep that contract through an explicit registry,
and — unlike the shipped reference, whose `archs.py.__all__` no longer exports
`NestedUNet` (SURVEY.md §1 "repo-state inconsistency") — keep every advertised
arch constructible, so `--arch NestedUNet` works as the README documents.
"""

from typing import Any, Dict, Type

import flax.linen as nn

from .unet import UNet
from .nested_unet import NestedUNet
from .rdc import RDC, UNetRNN, UNetRM3, UNetRM7
from .ghost import GhostBottleneck, GhostModule, SqueezeExcite, UNetRNNGhost
from .dual_attention import (
    CAMModule, DualAttentionBlock, PAMModule, UNetRNNAttention,
    UNetRNNCAttention, UNetRNNPAttention,
)
from .attention_unet import AttU_Net, R2AttU_Net, R2U_Net
from .canet import (
    Comprehensive_Atten_Unet, GridAttentionBlock2D, MultiAttentionBlock,
    NonLocalBlock2D, ScaleAttenConvBlock, SEConvBlock, UpCat,
)
from .nonlocal_attention import MultiHeadAttention2D, multi_head_attention_2d
from .double_unet import DoubleUnet, UnetBlock
from .dual_deeplab import (
    ASPP, DeepLab, DualBottleneck, DualResNet, FCNHead, SAGate,
    duplicate_dualpath_params, resnet101,
)
from .psp_hybrid import UNetRNNCAttention_PSP, UNetRNNPSP
from .crdn_backbones import (
    BasicBlock, Bottleneck, ResNet18RNN, ResNet34RNN, ResNet50FCN, ResNet50RNN,
    ResNet50UNet, ResNet101RNN, ResNet152RNN, ResNetFCN, ResNetRNN, ResNetUNet,
    VGG16RNN,
)

_REGISTRY: Dict[str, Type[nn.Module]] = {}


def register(cls=None, *, name: str = None):
    def wrap(c):
        _REGISTRY[name or c.__name__] = c
        return c
    return wrap(cls) if cls is not None else wrap


def arch_names():
    return sorted(_REGISTRY)


def get_arch(name: str) -> Type[nn.Module]:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown arch {name!r}; available: {arch_names()}") from None


def create_model(name: str, num_classes: int = 1, input_channels: int = 3,
                 deep_supervision: bool = False, **kwargs) -> nn.Module:
    """Build a model with the reference trainer's constructor contract
    (reference trains.py:219-223)."""
    cls = get_arch(name)
    return cls(num_classes=num_classes, input_channels=input_channels,
               deep_supervision=deep_supervision, **kwargs)


def parse_arch_kwargs(name: str, raw):
    """Validate per-arch constructor options given as a JSON object string (or
    an already-parsed dict) — the train.py --arch_kwargs / config.yml
    'arch_kwargs' format. JSON arrays become tuples (flax dataclass fields
    must be hashable). Raises ValueError naming unknown fields."""
    if not raw:
        return {}
    import json

    kw = json.loads(raw) if isinstance(raw, str) else dict(raw)
    fields = getattr(get_arch(name), "__dataclass_fields__", {})
    unknown = sorted(set(kw) - set(fields))
    if unknown:
        raise ValueError(f"{name} has no field(s) {unknown}; "
                         f"available: {sorted(fields)}")

    def _freeze(v):
        # recursively, so nested specs like {"layers": [[1,1],[2,2]]} become
        # hashable (flax dataclass fields require it)
        return tuple(_freeze(x) for x in v) if isinstance(v, list) else v

    return {k: _freeze(v) for k, v in kw.items()}


register(UNet)
register(NestedUNet)
register(UNetRNN)
register(UNetRM3)
register(UNetRM7)
register(UNetRNNGhost)
register(UNetRNNPAttention)
register(UNetRNNCAttention)
register(UNetRNNAttention)
register(DoubleUnet)
register(DeepLab)
register(AttU_Net)
register(R2U_Net)
register(R2AttU_Net)
register(Comprehensive_Atten_Unet)
register(UNetRNNCAttention_PSP)
register(UNetRNNPSP)
register(VGG16RNN)
for _f in (ResNet18RNN, ResNet34RNN, ResNet50RNN, ResNet101RNN, ResNet152RNN,
           ResNet50UNet, ResNet50FCN):
    register(_f, name=_f.__name__)

ARCH_NAMES = arch_names()

__all__ = ["UNet", "NestedUNet", "Comprehensive_Atten_Unet",
           "UNetRNN", "UNetRM3", "UNetRM7",
           "UNetRNNGhost", "UNetRNNPAttention", "UNetRNNCAttention",
           "UNetRNNAttention", "UNetRNNCAttention_PSP", "UNetRNNPSP",
           "AttU_Net", "R2U_Net", "R2AttU_Net", "DoubleUnet", "UnetBlock",
           "DeepLab", "DualResNet", "DualBottleneck", "SAGate", "ASPP",
           "FCNHead", "resnet101", "duplicate_dualpath_params",
           "VGG16RNN", "ResNetRNN", "ResNet18RNN", "ResNet34RNN", "ResNet50RNN",
           "ResNet101RNN", "ResNet152RNN", "ResNetUNet", "ResNet50UNet",
           "ResNetFCN", "ResNet50FCN", "BasicBlock", "Bottleneck",
           "RDC", "GhostModule", "GhostBottleneck", "SqueezeExcite",
           "PAMModule", "CAMModule", "DualAttentionBlock",
           "MultiHeadAttention2D", "multi_head_attention_2d",
           "create_model", "get_arch", "arch_names", "register", "ARCH_NAMES"]
