"""SpaceTimeTransformer video tower (Flax).

A TPU-native implementation of the "Frozen-in-Time"-style divided space-time
attention ViT used by EgoVLP (behavioral reference:
/root/reference/model/video_transformer.py).  Faithful behaviors:

  * per-frame 16x16 conv patch embedding (:55-77);
  * positional embedding = spatial pos tiled per frame + temporal embed
    repeated per patch; CLS gets the spatial CLS position (:309-320);
  * variable input frames ``<= num_frames`` via slicing the positional
    table (:319-320);
  * block structure (:163-177):
      ``t = x + timeattn(norm3(x))``
      ``s = attn(norm1(t))``
      ``x = (x + drop_path(s)) + drop_path(mlp(norm2(x + drop_path(s))))``
    — note the space residual branches from the *original* ``x``
    (frozen-in-time style, :170-171); the published checkpoints depend on it;
  * time attention may be zero-initialized with its output projection
    weight filled with ones (:90-96) so the model starts as a pure ViT.

Layout notes: activations are ``[B, S, D]`` with ``S = 1 + F * N`` tokens;
inputs are ``[B, T, H, W, 3]`` (channels-last, the TPU/XLA-native layout —
the reference uses NCHW).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from egovlp_tpu.kernels.divided_attention import divided_attention_parts
from egovlp_tpu.kernels.fused_ln import FusedLayerNorm


def resolve_attention_impls(cfg_impl: str, frames: int,
                            backend: "str | None" = None):
    """Map an ``attention_impl`` config value to per-axis kernel choices.

    Returns ``(space_impl, time_impl)`` for the divided attention.  The
    ``'auto'`` policy on TPU is both kernels fused at every frame count:
    since the MXU-segmented time bodies landed (r4,
    pallas_attention._mk_time_fwd_bsd_v2 — 2.4x the old fi-batched bodies
    at 16f) the fused time kernel wins the full-tower A/B at 16 frames too
    (interleaved, scripts/attn16_ab.py: fwd+bwd 586.8 ms vs 590.5 XLA-time,
    fused winning 6/6 rounds; at 4f it wins ~29% at the full-step level).
    The space kernel wins at every measured shape.  ``'mixed'`` forces
    space fused + time XLA (the r3 f>=16 production path, kept as a
    measured escape hatch for toolchains where the time kernel
    misbehaves); ``'mixed2'`` its canonical-relayout variant;
    ``'xla'`` / ``'pallas'`` force one implementation for both axes.
    """
    if backend is None:
        backend = jax.default_backend()
    on_tpu = backend == "tpu"
    del frames  # kept in the signature for config forward-compat
    if cfg_impl == "auto":
        impl = "pallas" if on_tpu else "xla"
        return impl, impl
    if cfg_impl == "mixed":
        return ("pallas" if on_tpu else "xla"), "xla"
    if cfg_impl == "mixed2":
        # space fused + the canonical-relayout XLA time path
        # (kernels/divided_attention._time_xla_parts_v2) — A/B arm for the
        # 16f layout-copy attack, scripts/attn16_ab.py
        return ("pallas" if on_tpu else "xla"), "xla2"
    return cfg_impl, cfg_impl


@dataclasses.dataclass(frozen=True)
class VideoTowerConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_frames: int = 4
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    ln_eps: float = 1e-6
    time_init: str = "zeros"  # 'zeros' => starts as a ViT (reference :90-96)
    # divided-attention implementation — see resolve_attention_impls:
    # 'auto' (TPU: both kernels fused at every frame count, since the r4
    # MXU-segmented time bodies), 'mixed'/'mixed2' (space fused, time
    # XLA/XLA-canonical), or 'xla' / 'pallas' forcing both axes.
    attention_impl: str = "auto"
    # rematerialization (jax.checkpoint) for the backward pass:
    #   False/'none' — save all activations;
    #   True/'block' — remat each whole block: ~one fwd of extra FLOPs,
    #     O(depth) less activation memory (the r2 16f default);
    #   'mlp'        — remat only each block's MLP (the largest single
    #     activation producer: 4x-wide hidden) — cheaper recompute than
    #     'block' at most of the memory win;
    #   'attn'       — remat only the two attention applications;
    #   'attn_out'   — 'attn' plus a save_only_these_names policy keeping
    #     the named attention outputs, so the backward recomputes only
    #     the qkv Dense (not the kernel or proj).  Measured 16f winner:
    #     17.2 vs 15.0 ('attn') vs 14.9 ('block') clips/s;
    #     see bench.py ft16 field and scripts/remat_ab.py.
    remat: "bool | str" = False
    # Ulysses-style sequence/context parallelism (core/sp.py): name of the
    # mesh axis to shard the token grid over — patch columns during time
    # attention, frames during space attention; GSPMD inserts one
    # all-to-all between the phases.  Composes with every attention_impl:
    # the Pallas kernels carry Shardy partition rules that keep the
    # sp-sharded grid axis local (kernels/pallas_attention.py).  None = off.
    sequence_parallel: "str | None" = None

    @property
    def patches_per_frame(self) -> int:
        return (self.img_size // self.patch_size) ** 2


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # (deterministic is positional so nn.remat can mark it static)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class FusedQKVProj(nn.Module):
    """The fused qkv Dense computed as THREE kernel-sliced matmuls.

    Parameter tree and initialization are identical to
    ``nn.Dense(3 * dim, name="qkv")`` (``kernel [D, 3D]``, ``bias [3D]`` —
    the converter contract, models/convert.py), but the q/k/v outputs come
    straight out of their own matmuls instead of ``jnp.split`` on a
    ``[B, S, 3D]`` buffer.  The split is not free on TPU: XLA materializes
    the fused output AND three sliced copies (and the backward mirrors
    them as a concat) — ~114 layout copies of [16,3136,768], ~35 GB/step
    at the 16f shape, the single largest line of the HLO traffic audit
    (scripts/hlo_traffic.py).  Slicing the [D, 3D] KERNEL instead moves
    the same arithmetic to three [D, D] matmuls whose operand slices are
    ~2 MB.
    """

    dim: int
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        D = self.dim
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], 3 * D))
        bias = (self.param("bias", nn.initializers.zeros, (3 * D,))
                if self.use_bias else None)
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype) if bias is not None else None
        outs = []
        for i in range(3):
            y = x @ k[:, i * D:(i + 1) * D]
            if b is not None:
                y = y + b[i * D:(i + 1) * D]
            outs.append(y)
        return tuple(outs)


class VarAttention(nn.Module):
    """QKV projection + divided attention + output projection.

    ``zero_init=True`` reproduces the reference's time-attention init: qkv
    weight/bias zeros, output projection weight all-ones, bias zeros
    (video_transformer.py:90-96) — with zero qkv the attention output is the
    mean of (zero) values, so the block starts as an identity-free branch.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    zero_init: bool = False
    proj_drop: float = 0.0
    impl: str = "xla"
    sp_axis: "str | None" = None  # sequence-parallel mesh axis (core/sp.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, frames: int, patches: int, axis: str,
                 deterministic: bool = True):
        """``x`` is the ``(cls [B,1,D], patches [B,T,n,D])`` activation pair
        (see SpaceTimeBlock); shared Dense modules are applied to both parts
        so the parameter tree is identical to a concatenated layout.  All
        non-array args are positional so nn.remat can mark them static."""
        xc, xp = x
        D = xp.shape[-1]
        H = self.num_heads

        if self.sp_axis:
            from egovlp_tpu.core.sp import constrain_tokens

            # shard the token grid over the axis NOT attended; the phase
            # change (time<->space) across blocks becomes one all-to-all
            xp = constrain_tokens(xp, frames=frames, patches=patches,
                                  attend_axis=axis, axis_name=self.sp_axis)

        if self.zero_init:
            qkv_kernel_init = nn.initializers.zeros
            proj_kernel_init = nn.initializers.ones
        else:
            qkv_kernel_init = nn.initializers.lecun_normal()
            proj_kernel_init = nn.initializers.lecun_normal()

        qkv = FusedQKVProj(
            D,
            use_bias=self.qkv_bias,
            kernel_init=qkv_kernel_init,
            dtype=self.dtype,
            name="qkv",
        )
        qc, kc, vc = qkv(xc)
        qp, kp, vp = qkv(xp)

        # pair layout straight into the attention op: every reshape on the
        # Pallas path is free, and heads are lane-sliced in-kernel (no head
        # transpose or CLS splice touches HBM).
        oc, op = divided_attention_parts(qc, kc, vc, qp, kp, vp, heads=H,
                                         frames=frames, patches=patches,
                                         axis=axis, impl=self.impl)
        # named for the 'attn_out' remat policy (SpaceTimeBlock): saving
        # these [B, S, D] outputs means the backward recomputes only the
        # qkv Dense, not the attention kernel or the output projection
        oc = checkpoint_name(oc, "attn_out")
        op = checkpoint_name(op, "attn_out")

        if self.sp_axis:
            op = constrain_tokens(op, frames=frames, patches=patches,
                                  attend_axis=axis, axis_name=self.sp_axis)

        proj = nn.Dense(
            D, kernel_init=proj_kernel_init, dtype=self.dtype, name="proj"
        )
        drop = nn.Dropout(self.proj_drop)
        return (drop(proj(oc), deterministic=deterministic),
                drop(proj(op), deterministic=deterministic))


class SpaceTimeBlock(nn.Module):
    cfg: VideoTowerConfig
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, frames: int, patches: int,
                 deterministic: bool = True):
        """``x`` is the ``(cls, patches)`` activation pair; every module is
        applied to both parts with shared parameters, so the tree matches a
        concatenated [B, S, D] layout exactly."""
        cfg = self.cfg
        # FusedLayerNorm == nn.LayerNorm numerics with a memory-lean VJP
        # (flax's saves f32 [B,S,D] residuals — kernels/fused_ln.py)
        ln = lambda name: FusedLayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name=name)
        both = lambda m, pair: (m(pair[0]), m(pair[1]))
        add = lambda a, b: (a[0] + b[0], a[1] + b[1])

        # 'auto' on TPU = both kernels fused at every frame count
        # (see resolve_attention_impls for the measured policy history)
        space_impl, time_impl = resolve_attention_impls(
            cfg.attention_impl, frames)
        # sequence parallelism no longer forces the XLA op: the Pallas
        # kernels carry Shardy partition rules (pallas_attention.py) that
        # keep the sp-sharded grid axis local — frames for the space
        # kernel, patch columns for the time forward (the time backward
        # gathers n; see _time_bsd_ops).

        # selective remat: wrap ONLY the chosen submodule(s); 'block'-level
        # remat is applied by SpaceTimeTransformer around the whole block
        attn_cls = VarAttention
        mlp_cls = Mlp
        if cfg.remat == "attn":
            attn_cls = nn.remat(VarAttention, static_argnums=(2, 3, 4, 5))
        elif cfg.remat == "attn_out":
            # like 'attn' but SAVES the named attention outputs
            # ([B, S, D] per site): the backward then recomputes only the
            # qkv Dense — not the attention kernel or the output
            # projection — for ~1.85 GB more residency at the 16f shape
            attn_cls = nn.remat(
                VarAttention, static_argnums=(2, 3, 4, 5),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_out"),
            )
        elif cfg.remat == "mlp":
            mlp_cls = nn.remat(Mlp, static_argnums=(2,))

        time_out = attn_cls(
            cfg.embed_dim, cfg.num_heads, qkv_bias=cfg.qkv_bias,
            zero_init=(cfg.time_init == "zeros"), proj_drop=cfg.drop_rate,
            impl=time_impl, sp_axis=cfg.sequence_parallel,
            dtype=self.dtype, name="timeattn",
        )(both(ln("norm3"), x), frames, patches, "time", deterministic)
        time_residual = add(x, time_out)

        space_out = attn_cls(
            cfg.embed_dim, cfg.num_heads, qkv_bias=cfg.qkv_bias,
            proj_drop=cfg.drop_rate, impl=space_impl,
            sp_axis=cfg.sequence_parallel,
            dtype=self.dtype, name="attn",
        )(both(ln("norm1"), time_residual), frames, patches, "space",
          deterministic)

        space_out = self._drop_path(space_out, deterministic)
        # Frozen-in-time quirk: residual from the ORIGINAL x, not from
        # time_residual (reference :170-171).  Checkpoint parity requires it.
        space_residual = add(x, space_out)

        mlp = mlp_cls(
            int(cfg.embed_dim * cfg.mlp_ratio), cfg.embed_dim,
            dropout=cfg.drop_rate, dtype=self.dtype, name="mlp",
        )
        norm2 = ln("norm2")
        mlp_out = (mlp(norm2(space_residual[0]), deterministic),
                   mlp(norm2(space_residual[1]), deterministic))
        return add(space_residual, self._drop_path(mlp_out, deterministic))

    def _drop_path(self, pair, deterministic):
        if self.drop_path == 0.0 or deterministic:
            return pair
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        # ONE per-sample mask applied to both parts (a token-independent
        # path drop, exactly as on a concatenated layout); the parts may
        # differ in rank (cls [B,1,D] vs the [B,T,n,D] patch grid)
        mask = jax.random.bernoulli(rng, keep, (pair[1].shape[0],))

        def app(part):
            m = mask.reshape((-1,) + (1,) * (part.ndim - 1))
            return part * m / keep

        return (app(pair[0]), app(pair[1]))


class PatchEmbed(nn.Module):
    """16x16 conv patch embedding expressed as reshape + matmul.

    Operates on the channel-FOLDED layout [N, H, W*3] (see
    data/transforms.py: a minor dim of 3 wastes ~40x TPU lane bandwidth).
    The parameter keeps the conv shape [p, p, 3, D] so torch checkpoints
    convert unchanged; a VALID stride-p conv over non-overlapping patches
    is exactly a matmul of the flattened (h, w, c) patch vectors.
    """

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, H, WC = x.shape
        p = self.patch_size
        W = WC // 3
        hp, wp = H // p, W // p
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p, p, 3, self.embed_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        # [N, hp, p, wp, p*3] -> [N, hp, wp, p, p*3] -> [N, hp*wp, p*p*3]
        x = x.reshape(N, hp, p, wp, p * 3)
        x = x.transpose(0, 1, 3, 2, 4).reshape(N, hp * wp, p * p * 3)
        k = kernel.reshape(p * p * 3, self.embed_dim).astype(self.dtype)
        return x @ k + bias.astype(self.dtype)


class SpaceTimeTransformer(nn.Module):
    """Divided space-time attention transformer; returns the CLS feature.

    setup()-style so the pre-block embedding (`embed`), the block stack,
    and the CLS head (`head`) are separately callable — the pipeline-
    parallel path (core/pp.py) runs embed/head data-parallel and streams
    the block stack through pipeline stages.  Submodule names are the
    converter contract and match the previous compact layout exactly
    (pinned by tests/test_golden_convert.py)."""

    cfg: VideoTowerConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        D = cfg.embed_dim
        self.patch_embed = PatchEmbed(cfg.patch_size, D, dtype=self.dtype,
                                      name="patch_embed")
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, D)
        )
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, cfg.patches_per_frame + 1, D)
        )
        self.temporal_embed = self.param(
            "temporal_embed", nn.initializers.zeros, (1, cfg.num_frames, D)
        )
        self.pos_drop = nn.Dropout(cfg.drop_rate)
        dpr = [float(r) for r in np.linspace(0.0, cfg.drop_path_rate,
                                             cfg.depth)]
        block_cls = SpaceTimeBlock
        if cfg.remat in (True, "block"):
            block_cls = nn.remat(SpaceTimeBlock, static_argnums=(2, 3, 4))
        self.blocks = [
            block_cls(cfg, drop_path=dpr[i], dtype=self.dtype,
                      name=f"block{i:02d}")
            for i in range(cfg.depth)
        ]
        self.norm = FusedLayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype,
                                   name="norm")

    def embed(self, video, *, deterministic: bool = True):
        """[B, T, H, W(, 3)] -> the (cls, patches) activation pair.

        Patches ride as the 4-D GRID ``[B, T, n, D]`` through the whole
        block stack (not flat ``[B, T*n, D]``): the Pallas kernels and the
        pair-layout XLA time path consume exactly this shape, so between
        the patch embedding and the CLS head NO frame/patch re-tiling
        reshape ever touches HBM — on the flat layout those reshapes cost
        ~30 GB/step at the 16f fine-tune shape (scripts/hlo_traffic.py).
        """
        cfg = self.cfg
        if video.ndim == 5:
            B, T, H, W, C = video.shape
            video = video.reshape(B, T, H, W * C)
        B, T, H, WC = video.shape
        n = cfg.patches_per_frame
        D = cfg.embed_dim

        x = video.reshape(B * T, H, WC).astype(self.dtype)
        x = self.patch_embed(x)
        x = x.reshape(B, T, n, D)

        cls = jnp.broadcast_to(self.cls_token.astype(self.dtype), (B, 1, D))

        # spatial pos per frame + per-frame temporal embed, by broadcast on
        # the grid — same values the reference tiles/repeats on the flat
        # sequence ([1,2,..n,1,2,..n,...] / [t0 x n, t1 x n, ...],
        # reference :311-317), without materializing either tile
        patch_pos = (self.pos_embed[:, None, 1:, :]
                     + self.temporal_embed[:, :T, None, :])
        # activations ride as a (cls, patches) PAIR through the blocks: the
        # divided-attention fast path then never pays a CLS splice/concat
        # HBM pass (kernels/divided_attention.py::divided_attention_parts)
        cls = cls + self.pos_embed[:, :1].astype(self.dtype)
        x = x + patch_pos.astype(self.dtype)
        cls = self.pos_drop(cls, deterministic=deterministic)
        x = self.pos_drop(x, deterministic=deterministic)
        return cls, x

    def head(self, pair):
        """(cls, patches) -> CLS feature.  Only the CLS row passes the
        final LayerNorm; its params are identical either way."""
        return self.norm(pair[0])[:, 0]

    def __call__(self, video, *, deterministic: bool = True):
        """video: [B, T, H, W, 3] channels-last or channel-folded
        [B, T, H, W*3]; T <= cfg.num_frames."""
        T = video.shape[1]
        n = self.cfg.patches_per_frame
        pair = self.embed(video, deterministic=deterministic)
        for blk in self.blocks:
            pair = blk(pair, T, n, deterministic)
        return self.head(pair)
