"""Device mesh construction.

The serving deployment model (mirroring SURVEY §2.6): DP replicas are whole
scheduler processes (one per chip/host, no collective traffic) — that path
needs no mesh. Intra-model tensor parallelism over ICI (the TPU-native
addition for models that exceed one chip, e.g. GLM-4-Voice-9B on v5e) uses a
('dp', 'tp') mesh built here; GSPMD inserts the all-reduces.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = 1, tp: int | None = None,
              devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp, rem = divmod(n, dp)
        if tp == 0:
            raise ValueError(
                f"mesh dp={dp} needs at least {dp} devices, have {n}")
        if rem:
            # silent truncation hid chips from the deployment
            import logging

            logging.getLogger("vox_serve_tpu.parallel").warning(
                "mesh dp=%d over %d devices: %d trailing device(s) unused",
                dp, n, rem)
    if tp < 1 or dp * tp > n:
        raise ValueError(f"mesh dp={dp} x tp={tp} needs {dp * tp} devices, "
                         f"have {n}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
