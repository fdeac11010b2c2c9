"""Mixed-precision policy.

The reference uses CUDA AMP (fp16 autocast + GradScaler,
``/root/reference/train.py:113-116,159-167``). On TPU the idiomatic
equivalent is bf16 activations with fp32 parameters and fp32 loss/optimizer
state — bf16 shares fp32's exponent range, so no loss scaling is needed.
"""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "fp32": jnp.float32,
    "bf16": jnp.bfloat16,
}


def dtype_from_str(name: str):
    try:
        return _DTYPES[name]
    except KeyError:
        raise ValueError(f"unknown compute dtype {name!r}; use one of {list(_DTYPES)}")
