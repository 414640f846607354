"""Device mesh construction.

The dataset's parallel structure is pure object-batch data parallelism
(SURVEY.md §2.2): a 1-D mesh over the object axis. Feature kernels run
shard-local with zero communication; the GBDT psums per-feature gradient
histograms over ICI (XGBoost's distributed-hist algorithm on a mesh).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

OBJ_AXIS = "obj"
DCN_AXIS = "dcn"


def make_mesh(n_devices: Optional[int] = None, axis: str = OBJ_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(n_slices: int, per_slice: Optional[int] = None,
                 axes: tuple = (DCN_AXIS, OBJ_AXIS)) -> Mesh:
    """2-axis mesh for multi-slice scale-out: (slice, chip-within-slice).

    The trainer's row axis shards over BOTH axes (pass
    ``axis=(DCN_AXIS, OBJ_AXIS)``): per-shard histogram builds are
    unchanged, and the single histogram ``psum`` spans the joint axes —
    XLA lowers it hierarchically on real hardware (intra-slice reduction
    over ICI, inter-slice over DCN), which is the right topology because
    the psum'd histogram payload is identical per chip either way
    (PERF.md comm-volume account). Same identical-trees contract as the
    1-D mesh."""
    devs = jax.devices()
    if per_slice is None:
        if n_slices <= 0 or len(devs) % n_slices != 0:
            raise ValueError(
                f"make_mesh_2d: {len(devs)} devices do not split into "
                f"{n_slices} equal slices (pass per_slice explicitly to "
                "use a subset)")
        per_slice = len(devs) // n_slices
    if n_slices * per_slice > len(devs) or n_slices < 1 or per_slice < 1:
        raise ValueError(
            f"make_mesh_2d: need {n_slices}x{per_slice} devices, "
            f"have {len(devs)}")
    devs = devs[: n_slices * per_slice]
    return Mesh(np.array(devs).reshape(n_slices, per_slice), axes)


def resolve_axis(mesh: Mesh, axis):
    """The shard-axis default policy in ONE place: None -> all of the
    mesh's axes (joint sharding on multi-slice meshes, plain OBJ_AXIS
    behavior on 1-D meshes)."""
    return tuple(mesh.axis_names) if axis is None else axis


_DEFAULT_MESH: Optional[Mesh] = None


def set_default_mesh(mesh: Optional[Mesh]) -> None:
    """Process-wide default mesh. ``train_cv``/``train_cv_multiclass``
    resolve ``mesh=None`` to this, so one switch (the CLI's ``--mesh N``)
    turns every config's GBDT CV distributed without threading a mesh
    through each call site. Identical-trees contract unchanged."""
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def default_mesh() -> Optional[Mesh]:
    return _DEFAULT_MESH


def object_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Shard the leading (object) axis; replicate the rest.

    ``axis`` defaults to ALL of the mesh's axes, so objects shard over
    the full device set on both 1-D and multi-slice (2-axis) meshes."""
    return NamedSharding(mesh, P(resolve_axis(mesh, axis)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_packed(packed, mesh: Mesh, axis=None):
    """Place a PackedLightcurves (or any object-leading pytree) on the mesh,
    padding the object axis to a multiple of the mesh size."""
    from mallorn_tpu.data.packing import PackedLightcurves, pad_objects

    n_dev = mesh.devices.size
    if isinstance(packed, PackedLightcurves):
        n = packed.n_objects
        n_pad = ((n + n_dev - 1) // n_dev) * n_dev
        packed = pad_objects(packed, n_pad)
    sh = object_sharding(mesh, axis)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sh)
        return x

    return jax.tree.map(place, packed)
