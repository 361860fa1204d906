"""Device mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, str] = ("data", "library"),
              library_parallelism: int | None = None) -> Mesh:
    """Build a 2-D ``(data, library)`` mesh over the first ``n_devices``.

    ``library_parallelism`` fixes the library-axis size; by default the axis
    gets the largest power-of-two factor <= sqrt(n) so both axes scale.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    if library_parallelism is None:
        library_parallelism = 1
        while (library_parallelism * 2) ** 2 <= n and n % (library_parallelism * 2) == 0:
            library_parallelism *= 2
    if n % library_parallelism:
        raise ValueError(f"{n} devices not divisible by library axis {library_parallelism}")
    grid = np.array(devices[:n]).reshape(n // library_parallelism, library_parallelism)
    return Mesh(grid, axis_names)
