"""Initializers matching PyTorch layer defaults.

PyTorch `nn.Conv2d`/`nn.Linear` initialize weights with
`kaiming_uniform_(a=sqrt(5))`, which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
and biases with the same bound. JAX/Flax default to lecun_normal, which changes
early training dynamics at the reference's small batch sizes (SURVEY.md §7 "hard
parts"), so we match PyTorch exactly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Flax conv kernel (kh, kw, cin/groups, cout): U(±1/sqrt(kh*kw*cin_per_group))."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_transpose_kernel_init(key, shape, dtype=jnp.float32):
    """Flax ConvTranspose kernel (kh, kw, cin, cout).

    PyTorch ConvTranspose2d stores weight (cin, cout/groups, kh, kw) and computes
    fan_in = cout/groups * kh * kw — i.e. the *output* channel axis.
    """
    kh, kw, _, cout = shape
    fan_in = kh * kw * cout
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_dense_kernel_init(key, shape, dtype=jnp.float32):
    """Flax dense kernel (in, out): U(±1/sqrt(in))."""
    fan_in = int(shape[0])
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    """Bias init U(±1/sqrt(fan_in)); fan_in is the weight fan-in of the layer."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
