"""Sequence (context) parallelism for divided space-time attention.

The reference has no sequence sharding (SURVEY.md §2.7: max 3137 tokens fit
per GPU), so this is a TPU-native scaling extension, not a parity item: it
lets activation-heavy settings (16+ frame fine-tunes, higher resolutions,
long-context derivatives) shard the token grid across chips.

Divided attention factorizes the token grid ``[frames, patches]`` and only
ever attends along ONE of the two axes at a time, which makes it a perfect
fit for Ulysses-style context parallelism with a single resharding between
the two attention phases:

  * TIME attention groups by patch column (attends across frames) — local
    when tokens are sharded over the PATCH axis;
  * SPACE attention groups by frame (attends across patches) — local when
    tokens are sharded over the FRAME axis.

We express this declaratively: `constrain_tokens` places a
``with_sharding_constraint`` on the ``[B, F*N, D]`` patch activations,
sharding the group axis that the upcoming attention does NOT attend along.
GSPMD then partitions the attention einsums locally and inserts ONE
all-to-all (axis swap F<->N) between the time and space phases — the
TPU-native counterpart of DeepSpeed-Ulysses' hand-written all-to-alls.
The CLS row contracts over the sharded token axis and becomes a psum.

The constraint is a no-op when the named axis is absent or the mesh context
is missing, so the same model code runs unsharded.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


def constrain_tokens(xp: jax.Array, *, frames: int, patches: int,
                     attend_axis: str, axis_name: str) -> jax.Array:
    """Shard the patch tokens over the grid axis NOT attended.

    ``xp`` is the tower's grid layout ``[B, frames, patches, D]`` (the
    constraint applies directly — no reshape) or flat
    ``[B, frames*patches, D]`` (reshaped through the grid and back).

    attend_axis='time'  -> shard patches (each chip holds whole frame stacks
                           for a patch-column slice);
    attend_axis='space' -> shard frames (each chip holds whole frames).

    Returns ``xp`` (same shape) with the constraint applied; identity when
    no mesh with ``axis_name`` is active.
    """
    from egovlp_tpu.core.mesh import current_mesh

    mesh = current_mesh()  # NOT get_abstract_mesh: empty under `with mesh:`
    if mesh is None or axis_name not in getattr(mesh, "shape", {}):
        return xp
    if attend_axis == "time":
        spec = P(None, None, axis_name, None)
    elif attend_axis == "space":
        spec = P(None, axis_name, None, None)
    else:
        raise ValueError(attend_axis)
    if xp.ndim == 4:
        assert xp.shape[1:3] == (frames, patches), (xp.shape, frames,
                                                    patches)
        return jax.lax.with_sharding_constraint(xp, spec)
    B, S, D = xp.shape
    assert S == frames * patches, (S, frames, patches)
    grid = xp.reshape(B, frames, patches, D)
    grid = jax.lax.with_sharding_constraint(grid, spec)
    return grid.reshape(B, S, D)
