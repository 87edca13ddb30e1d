"""Device mesh construction and sharding helpers.

The reference scales with DDP over NCCL (4 nodes x 8 A100,
/root/reference/run/train_egoclip.py:42-45).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model`` axis
reserved for future tensor parallelism; the 220M-param dual encoder fits
per-chip, cf. SURVEY.md §2.7).  Batches are sharded over ``data``; parameters
are replicated.  XLA then inserts the all-gather for the global similarity
matrix and the psum for gradient averaging — the contract the reference
implements by hand with `AllGather_multi` + DDP
(/root/reference/trainer/trainer_egoclip.py:11-27, base/base_trainer.py:258).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh description.

    ``data`` = number of data-parallel groups WITHIN a slice (ICI),
    ``model`` = chips per group for tensor parallelism (1 for the EgoVLP
    parity configuration), ``dcn_data`` = number of slices combined over
    the data-center network (multi-slice pods).  The DCN dimension folds
    into the ``data`` mesh axis slice-major, so the model axis (latency-
    sensitive tp/sp all-to-alls) always stays inside one slice and the
    gradient psum crosses DCN exactly once per step — the standard
    multi-slice recipe (config key ``mesh.dcn_data``).
    """

    data: int = -1  # -1: use all devices
    model: int = 1
    dcn_data: int = 1

    def resolve(self, devices: Optional[Sequence[jax.Device]] = None) -> "MeshSpec":
        devices = devices if devices is not None else jax.devices()
        n = len(devices)
        dcn = max(1, self.dcn_data)
        data = self.data if self.data > 0 else n // (self.model * dcn)
        if data * self.model * dcn != n:
            raise ValueError(
                f"mesh {dcn}x{data}x{self.model} (dcn x data x model) "
                f"does not cover {n} devices"
            )
        return MeshSpec(data=data, model=self.model, dcn_data=dcn)


def create_mesh(
    spec: MeshSpec = MeshSpec(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh over the given devices.

    The device order is kept as-is: on real TPU slices ``jax.devices()`` is
    already ICI-contiguous, so neighbouring data-parallel ranks ride ICI, not
    DCN.

    ``dcn_data > 1`` (multi-slice): the data axis becomes
    ``dcn_data * data`` with slices as the SLOWEST-varying blocks, via
    ``mesh_utils.create_hybrid_device_mesh`` (reads each device's
    ``slice_index``); where slice indices are unavailable (CPU meshes,
    single-slice backends) it falls back to contiguous grouping, exact
    whenever ``jax.devices()`` is slice-ordered (it is, on real pods).
    """
    devices = list(devices if devices is not None else jax.devices())
    spec = spec.resolve(devices)
    if spec.dcn_data > 1:
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (spec.data, spec.model), (spec.dcn_data, 1), devices=devices)
            arr = arr.reshape(spec.dcn_data * spec.data, spec.model)
        except Exception:  # no slice_index attrs (cpu / single slice)
            arr = np.asarray(devices).reshape(
                spec.dcn_data * spec.data, spec.model)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(spec.data, spec.model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def current_mesh():
    """The mesh active at trace time, or None.

    Mesh-aware library code (sp.constrain_tokens, the ring loss, pp) must
    see the mesh from INSIDE a jitted trace.  `get_abstract_mesh` is only
    populated by `jax.set_mesh(...)`; the codebase (and most JAX user
    code) activates meshes with the plain `with mesh:` context manager,
    under which the abstract mesh is EMPTY — checking only it silently
    disables the feature (a real r3 bug: sequence-parallel constraints
    no-op'd).  Fall back to the context-manager's physical mesh."""
    am = jax.sharding.get_abstract_mesh()
    if am is not None and not getattr(am, "empty", True):
        return am
    try:
        from jax._src import mesh as _mesh_lib

        pm = _mesh_lib.thread_resources.env.physical_mesh
        if pm is not None and not pm.empty:
            return pm
    except Exception:
        pass
    return None


def data_sharding(mesh: Mesh, *, leading_axis: bool = True) -> NamedSharding:
    """Sharding that splits the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS) if leading_axis else P())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-axis sharding.

    Single-process: a plain sharded device_put.  Multi-host: each process
    holds only its local slice of the global batch (the per-process loader
    shard), assembled into one global array via
    ``jax.make_array_from_process_local_data``.
    """
    sh = data_sharding(mesh)
    if jax.process_count() > 1:
        put = lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x))
    else:
        put = lambda x: jax.device_put(x, sh)
    if isinstance(batch, dict):
        # underscore keys are host-side metadata (Loader ``_index`` etc.)
        # consumed by the eval gathers on the host — don't ship them
        batch = {k: v for k, v in batch.items() if not k.startswith("_")}
    return jax.tree_util.tree_map(put, batch)


def local_batch_to_global(batch_per_device: int, mesh: Mesh) -> int:
    return batch_per_device * mesh.shape[DATA_AXIS]
