"""Device mesh construction + multi-process runtime init.

The reference is single-GPU (torch.device("cuda:0") everywhere, SURVEY.md
§2.3); multi-chip scaling is a new first-class subsystem here. Axes:

- ``data``  one image per shard (embarrassingly parallel fits; the outer
            python loop of reference train.py:366-389 becomes a mesh axis)
- ``gauss`` shard the N Gaussians; pixel sums combine with one psum per
            render (valid because blending is a commutative sum)
- ``tile``  shard image tile-rows; parameter gradients combine with one
            psum per backward (the sequence-parallel analog)

Multi-host: ``maybe_initialize_distributed()`` wires the JAX distributed
runtime when launched under a multi-process coordinator, and ``make_mesh``
lays ``data`` across hosts (its shards never communicate per step) while the
per-step-psum axes ``gauss``/``tile`` stay within a host so their collectives
ride ICI, not DCN.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
from jax.sharding import Mesh


def maybe_initialize_distributed() -> bool:
    """Call ``jax.distributed.initialize()`` when a multi-process launch is
    detected (explicit coordinator env, or a SLURM/TPU-pod environment JAX
    can auto-detect). Safe no-op for single-process runs and repeat calls.

    Returns True if the distributed runtime is (now) initialized.

    Order matters: ``initialize()`` must run BEFORE anything that touches
    the XLA backend — ``jax.process_count()``/``jax.devices()`` initialize
    it as a side effect and make a later ``initialize()`` raise. So the
    launch-environment check is pure env-var sniffing, and the
    already-initialized check reads the distributed client directly.
    """
    # explicit coordinator address always counts; worker-count env vars
    # count only when they advertise MORE THAN ONE worker (single-host TPU
    # runtimes export TPU_WORKER_HOSTNAMES=localhost / SLURM exports
    # SLURM_JOB_NUM_NODES=1 — initialize() there would try to stand up a
    # coordinator nothing else joins)
    def _multi(v, sep=","):
        if not v:
            return False
        parts = [p for p in v.split(sep) if p]
        if len(parts) > 1:
            return True
        try:
            return int(parts[0]) > 1
        except ValueError:
            return False

    want = (any(os.environ.get(k) for k in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"))
        or _multi(os.environ.get("SLURM_JOB_NUM_NODES"))
        or _multi(os.environ.get("TPU_WORKER_HOSTNAMES")))
    if not want:
        return False
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None and is_init():
        return True
    # generic launchers (no SLURM/OMPI cluster env JAX can auto-detect)
    # describe the job explicitly: coordinator + process count + rank.
    # jax.distributed.initialize() accepts these as kwargs but only
    # auto-detects them for known cluster types, so pass them through.
    kwargs = {}
    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr and nproc is not None and pid is not None:
        kwargs = dict(coordinator_address=addr, num_processes=int(nproc),
                      process_id=int(pid))
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except RuntimeError:
        # initialize() raced something that already set up the backend (or
        # the env advertises a coordinator this process can't reach); report
        # whatever multi-processness actually materialized
        return jax.process_count() > 1


def mesh_axes_for(n_devices: int, want_data: bool = True,
                  want_gauss: bool = True, want_tile: bool = True
                  ) -> Dict[str, int]:
    """Factor n_devices into (data, gauss, tile) axis sizes, preferring to
    give the compute axes (gauss/tile) the small fast dimensions."""
    sizes = {"data": 1, "gauss": 1, "tile": 1}
    rem = n_devices
    if want_tile and rem % 2 == 0:
        sizes["tile"] = 2
        rem //= 2
    if want_gauss and rem % 2 == 0:
        sizes["gauss"] = 2
        rem //= 2
    if want_data:
        sizes["data"] = rem
        rem = 1
    elif want_gauss:
        sizes["gauss"] *= rem
        rem = 1
    assert rem == 1 or not (want_data or want_gauss), n_devices
    return sizes


def make_mesh(axis_sizes: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    """Build the (data, gauss, tile) mesh.

    Multi-process: devices are ordered host-major (jax.devices() groups by
    process), and ``data`` is the mesh's MAJOR axis — so when the data-axis
    size is a multiple of the host count, each (gauss, tile) block lands
    entirely within one host. The per-step psum collectives then ride ICI;
    only data-axis work (none per step — independent fits) would cross DCN.
    """
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = mesh_axes_for(len(devices))
    # data first = slowest-varying axis over the host-major device list
    order = [k for k in ("data", "gauss", "tile") if k in axis_sizes]
    order += [k for k in axis_sizes if k not in order]
    names = tuple(order)
    shape = tuple(axis_sizes[k] for k in order)
    if jax.process_count() > 1:
        import numpy as np
        arr = np.asarray(devices).reshape(shape)
        return Mesh(arr, names)
    return jax.make_mesh(shape, names, devices=devices)
