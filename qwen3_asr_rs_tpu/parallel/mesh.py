"""Device mesh construction.

The reference is strictly single-device (SURVEY.md §2.3); this module is
the TPU-native scaling layer it lacks: a (dp, tp) `jax.sharding.Mesh`
over ICI. Data parallelism shards utterance batches; tensor parallelism
shards decoder attention heads and MLP width (Megatron layout — XLA
inserts the psum after o_proj/down_proj automatically from the sharding
annotations).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
    tp_divisor_of: int = 8,
) -> Mesh:
    """Create a ('dp', 'tp') mesh.

    If dp/tp are not given, tp takes the largest power of two that divides
    both the device count and ``tp_divisor_of`` (the KV-head count — TP
    must divide it for clean head sharding), dp takes the rest.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)

    if tp is None and dp is None:
        tp = 1
        while (
            tp * 2 <= n
            and n % (tp * 2) == 0
            and tp_divisor_of % (tp * 2) == 0
        ):
            tp *= 2
        dp = n // tp
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != devices({n})")

    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
