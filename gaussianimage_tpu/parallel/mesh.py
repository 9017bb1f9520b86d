"""Device mesh construction.

The reference is single-GPU (torch.device("cuda:0") everywhere, SURVEY.md
§2.3); multi-chip scaling is a new first-class subsystem here. Axes:

- ``data``  one image per shard (embarrassingly parallel fits; the outer
            python loop of reference train.py:366-389 becomes a mesh axis)
- ``gauss`` shard the N Gaussians; pixel sums combine with one psum per
            render (valid because blending is a commutative sum)
- ``tile``  shard image tile-rows; parameter gradients combine with one
            psum per backward (the sequence-parallel analog)

On multi-host slices jax.make_mesh lays axes out so that the inner axes
(``gauss``/``tile`` — the ones that psum every step) ride ICI while ``data``
(no per-step collectives) spans DCN.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
from jax.sharding import Mesh


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
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = mesh_axes_for(len(devices))
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    return jax.make_mesh(shape, names, devices=devices)
