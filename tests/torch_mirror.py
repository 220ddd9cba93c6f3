"""A compact torch-functional mirror of the fairseq data2vec-multi audio
features_only forward, used ONLY as a numerical oracle for converter/parity
tests. Implemented from the behavioral contract (SURVEY.md §2.2), not copied
from the reference.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def rand_sd(cfg, seed=0):
    """Random fairseq-style state dict for the given EncoderConfig."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def t(*shape, scale=0.06):
        return torch.randn(*shape, generator=g) * scale

    A = "modality_encoders.AUDIO."
    in_c = 1
    for i, (dim, k, _s) in enumerate(cfg.conv_feature_layers):
        sd[f"{A}local_encoder.conv_layers.{i}.0.weight"] = t(dim, in_c, k, scale=0.3)
        sd[f"{A}local_encoder.conv_layers.{i}.2.1.weight"] = 1 + t(dim)
        sd[f"{A}local_encoder.conv_layers.{i}.2.1.bias"] = t(dim)
        in_c = dim
    feat_dim = cfg.conv_feature_layers[-1][0]
    E = cfg.embed_dim
    sd[f"{A}project_features.1.weight"] = 1 + t(feat_dim)
    sd[f"{A}project_features.1.bias"] = t(feat_dim)
    sd[f"{A}project_features.2.weight"] = t(E, feat_dim)
    sd[f"{A}project_features.2.bias"] = t(E)
    kpos = max(3, cfg.conv_pos_width // cfg.conv_pos_depth)
    for i in range(cfg.conv_pos_depth):
        sd[f"{A}relative_positional_encoder.{i + 1}.0.weight"] = t(
            E, E // cfg.conv_pos_groups, kpos
        )
        sd[f"{A}relative_positional_encoder.{i + 1}.0.bias"] = t(E)
    sd[f"{A}context_encoder.norm.weight"] = 1 + t(E)
    sd[f"{A}context_encoder.norm.bias"] = t(E)

    def block(prefix):
        H = int(E * cfg.mlp_ratio)
        sd[f"{prefix}.norm1.weight"] = 1 + t(E)
        sd[f"{prefix}.norm1.bias"] = t(E)
        sd[f"{prefix}.norm2.weight"] = 1 + t(E)
        sd[f"{prefix}.norm2.bias"] = t(E)
        sd[f"{prefix}.attn.qkv.weight"] = t(3 * E, E)
        sd[f"{prefix}.attn.qkv.bias"] = t(3 * E)
        sd[f"{prefix}.attn.proj.weight"] = t(E, E)
        sd[f"{prefix}.attn.proj.bias"] = t(E)
        sd[f"{prefix}.mlp.fc1.weight"] = t(H, E)
        sd[f"{prefix}.mlp.fc1.bias"] = t(H)
        sd[f"{prefix}.mlp.fc2.weight"] = t(E, H)
        sd[f"{prefix}.mlp.fc2.bias"] = t(E)

    for i in range(cfg.prenet_depth):
        block(f"{A}context_encoder.blocks.{i}")
    for i in range(cfg.depth):
        block(f"blocks.{i}")
    return sd


def _ln_c(x, w, b, eps=1e-5):
    """LayerNorm over the channel dim of (B, C, T)."""
    xt = x.transpose(1, 2)
    return F.layer_norm(xt, (xt.shape[-1],), w, b, eps).transpose(1, 2)


def _block_fwd(x, sd, prefix, num_heads, eps=1e-6):
    """Post-LN AltBlock forward. x: (B, N, E)."""
    B, N, E = x.shape
    H = num_heads
    Dh = E // H
    qkv = F.linear(x, sd[f"{prefix}.attn.qkv.weight"], sd[f"{prefix}.attn.qkv.bias"])
    qkv = qkv.reshape(B, N, 3, H, Dh).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * (Dh**-0.5)) @ k.transpose(-2, -1)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, E)
    out = F.linear(out, sd[f"{prefix}.attn.proj.weight"], sd[f"{prefix}.attn.proj.bias"])
    x = x + out
    r = F.layer_norm(x, (E,), sd[f"{prefix}.norm1.weight"], sd[f"{prefix}.norm1.bias"], eps)
    h = F.linear(r, sd[f"{prefix}.mlp.fc1.weight"], sd[f"{prefix}.mlp.fc1.bias"])
    h = F.gelu(h)
    h = F.linear(h, sd[f"{prefix}.mlp.fc2.weight"], sd[f"{prefix}.mlp.fc2.bias"])
    x = F.layer_norm(r + h, (E,), sd[f"{prefix}.norm2.weight"], sd[f"{prefix}.norm2.bias"], eps)
    return x


@torch.no_grad()
def mirror_extract(sd, cfg, wav_np, normalize=True):
    """Single-clip forward: wav (T,) -> (T', E). The oracle for parity."""
    A = "modality_encoders.AUDIO."
    x = torch.from_numpy(np.asarray(wav_np)).float()
    if normalize:
        x = F.layer_norm(x, x.shape)
    x = x.view(1, 1, -1)
    for i, (_dim, k, s) in enumerate(cfg.conv_feature_layers):
        x = F.conv1d(x, sd[f"{A}local_encoder.conv_layers.{i}.0.weight"], stride=s)
        x = _ln_c(
            x,
            sd[f"{A}local_encoder.conv_layers.{i}.2.1.weight"],
            sd[f"{A}local_encoder.conv_layers.{i}.2.1.bias"],
        )
        x = F.gelu(x)
    x = x.transpose(1, 2)  # (1, T', C)
    x = F.layer_norm(
        x,
        (x.shape[-1],),
        sd[f"{A}project_features.1.weight"],
        sd[f"{A}project_features.1.bias"],
    )
    x = F.linear(x, sd[f"{A}project_features.2.weight"], sd[f"{A}project_features.2.bias"])

    # relative positional encoder
    kpos = max(3, cfg.conv_pos_width // cfg.conv_pos_depth)
    pos = x.transpose(1, 2)
    for i in range(cfg.conv_pos_depth):
        pos = F.conv1d(
            pos,
            sd[f"{A}relative_positional_encoder.{i + 1}.0.weight"],
            sd[f"{A}relative_positional_encoder.{i + 1}.0.bias"],
            padding=kpos // 2,
            groups=cfg.conv_pos_groups,
        )
        if kpos % 2 == 0:
            pos = pos[..., :-1]
        pos = _ln_c(pos, None, None)
        pos = F.gelu(pos)
    x = x + pos.transpose(1, 2)

    x = F.layer_norm(
        x,
        (x.shape[-1],),
        sd[f"{A}context_encoder.norm.weight"],
        sd[f"{A}context_encoder.norm.bias"],
        1e-6,
    )
    for i in range(cfg.prenet_depth):
        x = _block_fwd(x, sd, f"{A}context_encoder.blocks.{i}", cfg.num_heads)
    for i in range(cfg.depth):
        x = _block_fwd(x, sd, f"blocks.{i}", cfg.num_heads)
    return x.squeeze(0).numpy()
