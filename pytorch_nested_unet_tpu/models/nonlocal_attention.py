"""Non-local U-Nets 2D multi-head attention block.

Reference: archs.py:964-1077 (`multi_head_attention_2d`, vendored from
Whu-wxy/Non-local-U-Nets-2D-block). Scaled dot-product attention over all
spatial positions with 1x1 (SAME), strided-conv (DOWN), or transposed-conv (UP)
query transforms.

The reference exports it in archs.__all__ (archs.py:23) although it is a block,
not a (num_classes, input_channels, deep_supervision)-constructible model — the
trainer would crash constructing it. We expose it as a reusable block (not in
the arch registry) and document that divergence.

TPU notes: the attention is one big (B*Hq*Wq*N, B*H*W*N) matmul in the
reference's flattened formulation — here a batched einsum per head that XLA
tiles onto the MXU; softmax in float32.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import TorchConv, TorchConvTranspose


class MultiHeadAttention2D(nn.Module):
    """Multihead scaled-dot-product attention with input/output transforms
    (reference archs.py:964-1077). layer_type: SAME | DOWN | UP."""

    key_filters: int = 16
    value_filters: int = 16
    output_filters: int = 40
    num_heads: int = 2
    dropout_prob: float = 0.5
    layer_type: str = "SAME"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.key_filters % self.num_heads:
            raise ValueError("Key depth must be divisible by the number of heads.")
        if self.value_filters % self.num_heads:
            raise ValueError("Value depth must be divisible by the number of heads.")
        if self.layer_type not in ("SAME", "DOWN", "UP"):
            raise ValueError(f"Layer type ({self.layer_type}) must be SAME, DOWN or UP.")

        if self.layer_type == "SAME":
            q = TorchConv(self.key_filters, 1, dtype=self.dtype, name="QueryTransform")(x)
        elif self.layer_type == "DOWN":
            q = TorchConv(self.key_filters, 3, stride=2, padding=1,
                          dtype=self.dtype, name="QueryTransform")(x)
        else:  # UP: output_size = 2x input (reference archs.py:1025-1027) —
            # torch infers output_padding=1 from the requested output_size.
            q = TorchConvTranspose(self.key_filters, 3, stride=2, padding=1,
                                   output_padding=1, dtype=self.dtype,
                                   name="QueryTransform")(x)

        k = TorchConv(self.key_filters, 1, dtype=self.dtype, name="KeyTransform")(x)
        v = TorchConv(self.value_filters, 1, dtype=self.dtype, name="ValueTransform")(x)

        b, hq, wq = q.shape[0], q.shape[1], q.shape[2]
        n = self.num_heads
        ck = self.key_filters // n
        cv = self.value_filters // n

        q = q.reshape(b, hq * wq, n, ck) / jnp.asarray(ck ** 0.5, q.dtype)
        k = k.reshape(b, -1, n, ck)
        v = v.reshape(b, -1, n, cv)

        logits = jnp.einsum("bqnc,bknc->bnqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.dropout_prob, deterministic=not train,
                          name="attention_dropout")(attn)
        out = jnp.einsum("bnqk,bknc->bqnc", attn, v).reshape(b, hq, wq, n * cv)
        return TorchConv(self.output_filters, 1, dtype=self.dtype, name="outputConv")(out)


# Reference-compatible alias (archs.py exports this exact name in __all__).
multi_head_attention_2d = MultiHeadAttention2D
