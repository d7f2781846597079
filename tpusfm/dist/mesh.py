"""Device mesh construction + multi-host runtime initialization."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "devices") -> Mesh:
    """A 1-D mesh over the first n devices (all by default).

    SfM's parallel axes (pairs, observations, views) are all flat batch
    axes, so a 1-D mesh suffices; on a multi-host pod the same axis spans
    hosts and chips and XLA routes collectives over ICI within a slice.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def mesh_from_config(config, n_devices: int | None = None) -> Mesh:
    """Mesh named by the config's ``mesh_axis`` knob (SfMConfig.mesh_axis)."""
    return make_mesh(n_devices, axis=config.mesh_axis)


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Multi-host bring-up (jax.distributed). No-op when single-process.

    The reference has no communication backend at all (SURVEY.md §5);
    this is the TPU-native equivalent layer: one call per host, after
    which jax.devices() spans the pod and collectives ride ICI/DCN.
    """
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
