"""Multi-host runtime: jax.distributed init + pod-slice mesh construction.

The reference is a single shared-memory process; its only 'collective' is a
future-wait barrier (reference: source/Renderer.cpp:74-77).  The TPU-native
equivalent is the JAX multi-controller runtime: every host runs this same
program, ``jax.distributed.initialize`` wires the cluster, and meshes span
all global devices with ICI-major axis order (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """Initialize the multi-host runtime (no-op for single process).

    On TPU pods with standard env vars, bare ``jax.distributed.initialize()``
    auto-discovers everything; arguments are for manual clusters.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:  # already initialized / single host
        if "already initialized" not in str(e):
            raise


def pod_mesh(prim: int = 1) -> Mesh:
    """Global (px, prim) mesh over all devices of the pod slice.

    The ``px`` (data-parallel) axis is laid out within-host first so the
    high-traffic all-gather of hit records over ``prim`` stays on ICI and
    only the low-volume image assembly crosses DCN.
    """
    devs = np.asarray(jax.devices())
    n = len(devs)
    assert n % prim == 0, (n, prim)
    return Mesh(devs.reshape(n // prim, prim), axis_names=("px", "prim"))


def is_primary() -> bool:
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()
