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


register(UNet)
register(NestedUNet)

ARCH_NAMES = arch_names()

__all__ = ["UNet", "NestedUNet", "create_model", "get_arch", "arch_names",
           "register", "ARCH_NAMES"]
