"""Device-mesh helpers for the sharded pipeline.

Axes:
  * ``time`` — contiguous IQ time-blocks (sequence-parallel axis; windows
    that straddle block boundaries get their overlap samples from the right
    neighbor via ``ppermute`` halo exchange — the reference's overlapped
    sliding (kspecanal.py:368,385-395) is pure overlap-save, so the halo is
    ``fftSize - hop`` samples, SURVEY.md §5 long-context).
  * ``band`` — scan-mode sub-bands (expert-parallel analog: each device
    owns a set of retune bands, stitched after an all-gather,
    SURVEY.md §2.3 EP row).

On a multi-host pod slice the same mesh spans hosts
(``jax.distributed.initialize`` + DCN for the cross-host edges); in tests
it is built from virtual CPU devices.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh  # noqa: F401


def make_mesh(time: int = 1, band: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(jax.devices()) if devices is None else list(devices)
    need = time * band
    if need > len(devs):
        raise ValueError(f"mesh {time}x{band} needs {need} devices, "
                         f"have {len(devs)}")
    arr = np.asarray(devs[:need]).reshape(time, band)
    return Mesh(arr, axis_names=("time", "band"))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` wrapper.

    On a multi-host pod slice each host calls this before any jax use; the
    global device list then spans the slice and :func:`make_mesh` lays the
    'time'/'band' axes across ICI within a host's chips and DCN across
    hosts (put 'band' — one all-gather per sweep — on the DCN edge and
    'time' — per-step halo ppermute — on ICI; axis order in make_mesh's
    reshape does exactly that when ``time`` divides the per-host chip
    count).  No-op when jax.distributed is already initialized or args are
    absent and the environment provides none (single-host dev).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass
