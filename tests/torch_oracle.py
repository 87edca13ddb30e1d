"""Independent torch oracle for the SpaceTimeTransformer semantics.

A functional (state-dict driven) forward pass used ONLY as a test oracle to
validate the Flax tower + weight converter against torch numerics.  Written
from the behavioral spec in SURVEY.md §3.3; intentionally structured as pure
functions over a flat state dict rather than modules.
"""

import numpy as np
import torch
import torch.nn.functional as F


def _ln(x, sd, name, eps=1e-6):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{name}.weight"], sd[f"{name}.bias"], eps)


def _lin(x, sd, name):
    return x @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]


def _var_attention(x, sd, prefix, heads, frames, patches, axis):
    """CLS-splice divided attention over [B, S, D]."""
    B, S, D = x.shape
    hd = D // heads
    qkv = _lin(x, sd, f"{prefix}.qkv")
    q, k, v = qkv.chunk(3, dim=-1)
    q, k, v = (t.reshape(B, S, heads, hd).permute(0, 2, 1, 3) for t in (q, k, v))
    q = q * hd ** -0.5

    cls_q, cls_k, cls_v = q[:, :, :1], k[:, :, :1], v[:, :, :1]
    cls_out = torch.softmax(cls_q @ k.transpose(-1, -2), -1) @ v  # [B,H,1,hd]

    def grp(t):
        t = t[:, :, 1:].reshape(B, heads, frames, patches, hd)
        return t.transpose(2, 3) if axis == "time" else t

    qg, kg, vg = grp(q), grp(k), grp(v)
    G, L = qg.shape[2], qg.shape[3]
    kg = torch.cat([cls_k.unsqueeze(2).expand(B, heads, G, 1, hd), kg], dim=3)
    vg = torch.cat([cls_v.unsqueeze(2).expand(B, heads, G, 1, hd), vg], dim=3)
    og = torch.softmax(qg @ kg.transpose(-1, -2), -1) @ vg
    if axis == "time":
        og = og.transpose(2, 3)
    og = og.reshape(B, heads, frames * patches, hd)
    out = torch.cat([cls_out, og], dim=2)
    out = out.permute(0, 2, 1, 3).reshape(B, S, D)
    return _lin(out, sd, f"{prefix}.proj")


def space_time_forward(sd, video, num_frames, heads, depth, patch_size=16):
    """video: [B, T, 3, H, W] float tensor -> CLS feature [B, D]."""
    B, T, C, H, W = video.shape
    w = sd["patch_embed.proj.weight"]
    D = w.shape[0]
    x = F.conv2d(video.reshape(B * T, C, H, W), w,
                 sd["patch_embed.proj.bias"], stride=patch_size)
    n = x.shape[-1] * x.shape[-2]
    x = x.flatten(2).transpose(1, 2).reshape(B, T * n, D)

    cls = sd["cls_token"].expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1)
    pos = sd["pos_embed"]
    tile_pos = pos[:, 1:].repeat(1, num_frames, 1)
    tile_tmp = sd["temporal_embed"].repeat_interleave(n, dim=1)
    total = torch.cat([pos[:, :1], tile_pos + tile_tmp], dim=1)
    x = x + total[:, : x.shape[1]]

    for i in range(depth):
        b = f"blocks.{i}"
        t_out = _var_attention(_ln(x, sd, f"{b}.norm3"), sd, f"{b}.timeattn",
                               heads, T, n, "time")
        time_res = x + t_out
        s_out = _var_attention(_ln(time_res, sd, f"{b}.norm1"), sd, f"{b}.attn",
                               heads, T, n, "space")
        space_res = x + s_out  # residual from ORIGINAL x
        h = _ln(space_res, sd, f"{b}.norm2")
        h = _lin(F.gelu(_lin(h, sd, f"{b}.mlp.fc1")), sd, f"{b}.mlp.fc2")
        x = space_res + h

    x = _ln(x, sd, "norm")
    return x[:, 0]


def random_space_time_state_dict(rng, *, dim, depth, heads, num_frames,
                                 patches_per_frame, patch_size=16,
                                 zero_time=False):
    """Random torch state dict in timm/SpaceTimeTransformer naming."""
    def t(*shape, scale=0.02):
        return torch.tensor(rng.normal(scale=scale, size=shape), dtype=torch.float32)

    sd = {
        "patch_embed.proj.weight": t(dim, 3, patch_size, patch_size),
        "patch_embed.proj.bias": t(dim),
        "cls_token": t(1, 1, dim),
        "pos_embed": t(1, patches_per_frame + 1, dim),
        "temporal_embed": t(1, num_frames, dim),
        "norm.weight": 1 + t(dim),
        "norm.bias": t(dim),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        for ln in ("norm1", "norm2", "norm3"):
            sd[f"{b}.{ln}.weight"] = 1 + t(dim)
            sd[f"{b}.{ln}.bias"] = t(dim)
        for attn in ("attn", "timeattn"):
            if zero_time and attn == "timeattn":
                sd[f"{b}.{attn}.qkv.weight"] = torch.zeros(3 * dim, dim)
                sd[f"{b}.{attn}.qkv.bias"] = torch.zeros(3 * dim)
                sd[f"{b}.{attn}.proj.weight"] = torch.ones(dim, dim)
                sd[f"{b}.{attn}.proj.bias"] = torch.zeros(dim)
            else:
                sd[f"{b}.{attn}.qkv.weight"] = t(3 * dim, dim)
                sd[f"{b}.{attn}.qkv.bias"] = t(3 * dim)
                sd[f"{b}.{attn}.proj.weight"] = t(dim, dim)
                sd[f"{b}.{attn}.proj.bias"] = t(dim)
        sd[f"{b}.mlp.fc1.weight"] = t(4 * dim, dim)
        sd[f"{b}.mlp.fc1.bias"] = t(4 * dim)
        sd[f"{b}.mlp.fc2.weight"] = t(dim, 4 * dim)
        sd[f"{b}.mlp.fc2.bias"] = t(dim)
    return sd
