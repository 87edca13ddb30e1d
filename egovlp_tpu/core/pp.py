"""Pipeline parallelism for the video tower's block stack.

The reference scales with data parallelism only; tp/sp (core/tp.py,
core/sp.py) already extend that.  This module adds the third TPU-native
scaling axis: GPipe-style microbatch pipelining of the SpaceTimeBlock
stack over a ``stage`` mesh axis — for derivatives deep enough that one
chip cannot hold a full replica even with tensor parallelism.

Design (the "pipelining via collective permute" recipe from the public
scaling playbook; no NCCL send/recv, just ``ppermute`` on ICI):

  * the per-block param subtrees (``block00..block{D-1}``, the converter
    contract) are STACKED on a leading depth axis (`stack_block_params`)
    and sharded over ``stage`` so each chip owns D/S consecutive blocks;
  * inside ``shard_map`` each chip runs ``n_micro + S - 1`` ticks; at
    every tick it applies its blocks (a ``lax.scan`` over the local
    depth) to the activation it holds, then rotates activations one hop
    around the ring.  Stage 0 injects microbatch t at tick t; the last
    stage's outputs are psum-collected (zeros elsewhere);
  * activations ride as the tower's (cls, patches) pair; everything is
    differentiable (scan + ppermute), so the same path trains.

The bubble fraction is (S-1)/(n_micro + S - 1) — pick n_micro >= 4*S.
Numerical equality with the sequential stack (fwd AND grads) is asserted
in tests/test_multichip.py.
"""

from __future__ import annotations

import re
from typing import Dict

import jax
import jax.numpy as jnp

STAGE_AXIS = "stage"


def block_names(params: Dict) -> list:
    names = sorted(k for k in params if re.fullmatch(r"block\d+", k))
    if not names:
        raise ValueError("no blockXX subtrees in params")
    return names


def stack_block_params(params: Dict):
    """{block00..} -> one pytree with leaves stacked on a leading depth
    axis (depth order preserved)."""
    names = block_names(params)
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *(params[n] for n in names))


def unstack_block_params(stacked, depth: int) -> Dict:
    return {f"block{i:02d}": jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(depth)}


def pipeline_blocks(pair, stacked_params, block_apply, *, n_stages: int,
                    n_micro: int, axis_name: str = STAGE_AXIS,
                    data_axis: "str | None" = None):
    """Run the stacked block stack as an ``n_stages``-deep pipeline.

    Args:
      pair: (cls [B, 1, D], patches [B, S, D]) tower activations; B must
        divide into ``n_micro`` microbatches.
      stacked_params: `stack_block_params` output, leaves [depth, ...].
        Leading dim must divide ``n_stages``.
      block_apply: ``(block_param_subtree, pair) -> pair`` — one block.
      n_micro: number of microbatches (>= 1; bubble = (S-1)/(n_micro+S-1)).
      data_axis: optional second mesh axis to ALSO data-parallelise over —
        microbatch rows shard across it (each data replica pipelines its
        slice through the same stages; params stay stage-sharded only).

    Returns the transformed (cls, patches) pair.  Must run under a mesh
    whose ``axis_name`` axis has size ``n_stages``; call it INSIDE jit —
    it wraps its body in ``shard_map`` over that axis.
    """
    cls, xp = pair
    B = cls.shape[0]
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if B % n_micro or depth % n_stages:
        raise ValueError(f"B={B} % n_micro={n_micro} or depth={depth} % "
                         f"n_stages={n_stages} != 0")
    mb = B // n_micro

    # [n_micro, mb, ...] microbatch views
    mc = cls.reshape(n_micro, mb, *cls.shape[1:])
    mx = xp.reshape(n_micro, mb, *xp.shape[1:])

    from jax.sharding import PartitionSpec as P

    from egovlp_tpu.core.mesh import current_mesh

    mesh = current_mesh()
    if mesh is None or axis_name not in getattr(mesh, "shape", {}):
        raise ValueError(
            f"pipeline_blocks needs an active mesh with a '{axis_name}' "
            "axis (use `with mesh:` or jax.set_mesh around the jit call)")
    if data_axis is not None:
        if data_axis not in mesh.shape:
            raise ValueError(
                f"data_axis '{data_axis}' not in mesh axes {dict(mesh.shape)}")
        if mb % mesh.shape[data_axis]:
            raise ValueError(
                f"microbatch rows B/n_micro={mb} must divide the "
                f"'{data_axis}' axis size {mesh.shape[data_axis]}")

    # params: leading depth axis sharded over stages; activations replicated
    # into the region (stage 0 consumes them; ~B*S*D bytes, the same order
    # as one data-parallel replica's activations)
    def body(stacked_local, mc_in, mx_in):
        stage = jax.lax.axis_index(axis_name)
        n_ticks = n_micro + n_stages - 1

        def apply_stage(carry_pair):
            out, _ = jax.lax.scan(
                lambda pr, p: (block_apply(p, pr), None),
                carry_pair, stacked_local)
            return out

        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        oc = jnp.zeros_like(mc_in)
        ox = jnp.zeros_like(mx_in)
        # rotating activation buffer held by this stage
        hc = jnp.zeros_like(mc_in[0])
        hx = jnp.zeros_like(mx_in[0])

        def tick(state, t):
            hc, hx, oc, ox = state
            # stage 0 injects microbatch t (clamped; masked out later)
            t_in = jnp.clip(t, 0, n_micro - 1)
            inj_c = jax.lax.dynamic_index_in_dim(mc_in, t_in, keepdims=False)
            inj_x = jax.lax.dynamic_index_in_dim(mx_in, t_in, keepdims=False)
            use_inj = (stage == 0) & (t < n_micro)
            hc = jnp.where(use_inj, inj_c, hc)
            hx = jnp.where(use_inj, inj_x, hx)

            hc, hx = apply_stage((hc, hx))

            # last stage banks microbatch m = t - (n_stages - 1)
            m = t - (n_stages - 1)
            valid = (stage == n_stages - 1) & (m >= 0)
            m_in = jnp.clip(m, 0, n_micro - 1)

            def bank(buf, val):
                # masked slice update (slice-sized `where`, not buffer-sized)
                old = jax.lax.dynamic_index_in_dim(buf, m_in, keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.where(valid, val, old), m_in, axis=0)

            oc = bank(oc, hc)
            ox = bank(ox, hx)

            hc = jax.lax.ppermute(hc, axis_name, perm)
            hx = jax.lax.ppermute(hx, axis_name, perm)
            return (hc, hx, oc, ox), None

        # scan (not fori_loop/while) so the pipeline is reverse-mode
        # differentiable — training runs through this path
        (_, _, oc, ox), _ = jax.lax.scan(
            tick, (hc, hx, oc, ox), jnp.arange(n_ticks))
        # outputs live on the last stage only -> replicate via psum
        oc = jax.lax.psum(oc, axis_name)
        ox = jax.lax.psum(ox, axis_name)
        return oc, ox

    spec_params = jax.tree_util.tree_map(
        lambda _: P(axis_name), stacked_params)
    act_spec = P(None, data_axis) if data_axis else P()
    oc, ox = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_params, act_spec, act_spec),
        out_specs=(act_spec, act_spec),
        check_vma=False,
    )(stacked_params, mc, mx)
    return (oc.reshape(B, *cls.shape[1:]), ox.reshape(B, *xp.shape[1:]))


def video_tower_pp_apply(tower, variables, video, *, n_stages: int,
                         n_micro: int, axis_name: str = STAGE_AXIS,
                         data_axis: "str | None" = None,
                         deterministic: bool = True):
    """Apply a SpaceTimeTransformer with its block stack pipelined.

    The patch embedding / positional sums (`tower.embed`) and the CLS head
    (`tower.head`) run replicated (they are <2% of tower FLOPs); the
    D-deep block stack streams through ``n_stages`` pipeline stages in
    ``n_micro`` microbatches.  Numerically identical to ``tower.apply``
    (asserted in tests).  Stochastic layers are not supported on this
    path (EgoVLP defaults run with drop_rate = drop_path_rate = 0)."""
    from egovlp_tpu.models.video_tower import SpaceTimeBlock

    cfg = tower.cfg
    if (cfg.drop_rate or cfg.drop_path_rate) and not deterministic:
        raise NotImplementedError(
            "pipelined tower does not thread dropout rngs; run with "
            "drop_rate=drop_path_rate=0 or deterministic=True")
    params = variables.get("params", variables)
    pair = tower.apply({"params": params}, video,
                       deterministic=deterministic, method="embed")
    T = video.shape[1]
    n = cfg.patches_per_frame
    blk = SpaceTimeBlock(cfg, dtype=tower.dtype)
    stacked = stack_block_params(
        {k: v for k, v in params.items() if re.fullmatch(r"block\d+", k)})

    def block_apply(p, pr):
        return blk.apply({"params": p}, pr, T, n, deterministic)

    pair = pipeline_blocks(pair, stacked, block_apply, n_stages=n_stages,
                           n_micro=n_micro, axis_name=axis_name,
                           data_axis=data_axis)
    return tower.apply({"params": params}, pair, method="head")
