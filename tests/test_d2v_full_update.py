"""WHOLE-UPDATE d2v parity: a torch replica of one complete data2vec-2.0
update — teacher targets off the EMA blocks, masked student forward with
token removal, Decoder1d, frame+utterance losses, clipped AdamW with the
warmup-cosine schedule, annealed EMA — stepped ~15 times against
``models/d2v_pretrain.make_d2v_train_step``, with the stochastic mask draws
shared (parity-protocol style). Loss trajectories and the trained parameters
must track; this closes VERDICT r2 gap #4a (component oracles existed, the
aggregate update did not).

Determinism knobs: all dropout rates 0, ``mask_noise_std=0`` (mask tokens
are zeros), ``encoder_zero_mask=True``, ``clone_batch=1``.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    D2vDecoderConfig,
    D2vPretrainConfig,
    EncoderConfig,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models import (
    d2v_masking as dm,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.d2v_pretrain import (
    init_d2v_state,
    make_d2v_train_step,
)

ENC = EncoderConfig(
    embed_dim=16, depth=3, num_heads=2, prenet_depth=1,
    conv_feature_layers=((8, 4, 2), (8, 3, 2)),
    conv_pos_depth=2, conv_pos_width=10, conv_pos_groups=2,
    dtype="float32", use_flash_attention=False,
    encoder_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    post_mlp_drop=0.0,
)
DEC = D2vDecoderConfig(
    decoder_dim=8, decoder_groups=2, decoder_kernel=3, decoder_layers=2,
    input_dropout=0.0,
)
PCFG = D2vPretrainConfig(
    clone_batch=1, average_top_k_layers=2, mask_prob=0.5, mask_length=3,
    mask_noise_std=0.0, encoder_zero_mask=True, decoder=DEC,
    warmup_steps=3, max_steps=15, batch_size=4, crop_size=64,
    learning_rate=1e-3, ema_decay=0.99, ema_end_decay=0.999,
    ema_anneal_end_step=10, cls_loss=1.0,
)
B, T = 4, 64
TF = 15  # conv output length for T=64 through ((8,4,2),(8,3,2))


def to_t(a, grad=False):
    t = torch.from_numpy(np.array(a, np.float32, copy=True))
    t.requires_grad_(grad)
    return t


def flat_params(jax_params, grad=True):
    """jax tree -> {path: torch tensor}, flax layouts preserved (transposes
    happen inside the forward helpers)."""
    out = {}

    def walk(d, pre=""):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v, pre + k + "/")
            else:
                out[pre + k] = to_t(v, grad=grad)

    walk(jax_params["params"])
    return out


# --- torch forward helpers (pure functions of the param dict) ---------------
def _conv1d(x, kernel, bias=None, stride=1, padding=0, groups=1):
    """x (B,C,T); flax kernel (k, in/groups, out) -> torch (out, in/groups, k)."""
    w = kernel.permute(2, 1, 0)
    return F.conv1d(x, w, bias, stride=stride, padding=padding, groups=groups)


def _dense(x, kernel, bias):
    return F.linear(x, kernel.t(), bias)


def _ln(x, scale, bias, eps):
    return F.layer_norm(x, (x.shape[-1],), scale, bias, eps)


def local_features(p, wav):
    """(B, T) -> (B, T', E)."""
    x = wav.unsqueeze(1)  # (B, 1, T)
    for i, (_d, _k, s) in enumerate(ENC.conv_feature_layers):
        x = _conv1d(x, p[f"local_encoder/conv_{i}/kernel"], stride=s)
        x = _ln(x.transpose(1, 2), p[f"local_encoder/ln_{i}/scale"],
                p[f"local_encoder/ln_{i}/bias"], 1e-5).transpose(1, 2)
        x = F.gelu(x)
    x = x.transpose(1, 2)  # (B, T', C)
    x = _ln(x, p["proj_ln/scale"], p["proj_ln/bias"], 1e-5)
    return _dense(x, p["proj/kernel"], p["proj/bias"])


def positional(p, x):
    kpos = max(3, ENC.conv_pos_width // ENC.conv_pos_depth)
    pos = x.transpose(1, 2)
    for i in range(ENC.conv_pos_depth):
        pos = _conv1d(pos, p[f"pos_conv/pos_conv_{i}/kernel"],
                      p[f"pos_conv/pos_conv_{i}/bias"],
                      padding=kpos // 2, groups=ENC.conv_pos_groups)
        if kpos % 2 == 0:
            pos = pos[..., :-1]
        pos = F.layer_norm(pos.transpose(1, 2),
                           (pos.shape[1],)).transpose(1, 2)
        pos = F.gelu(pos)
    return pos.transpose(1, 2)


def block_fwd(p, prefix, x):
    """Post-LN AltBlock; returns (x, ffn_target)."""
    Bx, N, E = x.shape
    H, Dh = ENC.num_heads, E // ENC.num_heads
    qkv = _dense(x, p[f"{prefix}/attn/qkv/kernel"], p[f"{prefix}/attn/qkv/bias"])
    qkv = qkv.reshape(Bx, N, 3, H, Dh).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = ((q * Dh**-0.5) @ k.transpose(-2, -1)).softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(Bx, N, E)
    out = _dense(out, p[f"{prefix}/attn/proj/kernel"], p[f"{prefix}/attn/proj/bias"])
    x = x + out
    r = _ln(x, p[f"{prefix}/norm1/scale"], p[f"{prefix}/norm1/bias"], ENC.norm_eps)
    h = _dense(r, p[f"{prefix}/mlp/fc1/kernel"], p[f"{prefix}/mlp/fc1/bias"])
    h = F.gelu(h)
    t = _dense(h, p[f"{prefix}/mlp/fc2/kernel"], p[f"{prefix}/mlp/fc2/bias"])
    x = _ln(r + t, p[f"{prefix}/norm2/scale"], p[f"{prefix}/norm2/bias"], ENC.norm_eps)
    return x, t


def contextualize(p, x, main_params=None):
    """prenet LN + prenet blocks + main blocks. ``main_params`` overrides the
    main-block params (the EMA teacher). Returns (x, targets)."""
    x = _ln(x, p["prenet_ln/scale"], p["prenet_ln/bias"], ENC.norm_eps)
    for i in range(ENC.prenet_depth):
        x, _ = block_fwd(p, f"prenet_block_{i}", x)
    targets = []
    src = main_params if main_params is not None else p
    for i in range(ENC.depth):
        x, t = block_fwd(src, f"block_{i}", x)
        targets.append(t)
    return x, targets


def decoder_fwd(p, x):
    dc = DEC
    residual = x
    for i in range(dc.decoder_layers):
        x = _conv1d(x.transpose(1, 2), p[f"decoder/conv_{i}/kernel"],
                    p[f"decoder/conv_{i}/bias"], padding=dc.decoder_kernel // 2,
                    groups=dc.decoder_groups).transpose(1, 2)
        x = F.layer_norm(x, (x.shape[-1],))  # non-affine
        x = F.gelu(x)
        if dc.decoder_residual and residual.shape[-1] == x.shape[-1]:
            x = x + residual
        residual = x
    return _dense(x, p["decoder/proj_out/kernel"], p["decoder/proj_out/bias"])


def make_targets_t(layer_ts):
    tl = [F.instance_norm(t.transpose(1, 2)).transpose(1, 2)
          for t in layer_ts[-PCFG.average_top_k_layers:]]
    return sum(tl) / len(tl)


def d2v_loss_t(pred, target, w):
    scale = 1.0 / math.sqrt(pred.shape[-1])
    per_pos = ((pred - target) ** 2).sum(-1) * scale
    w = w.float()
    return (per_pos * w).sum() / w.sum().clamp(min=1.0)


def lr_at(step):
    """optax.warmup_cosine_decay_schedule(0, peak, warmup, decay_steps)."""
    warmup = min(PCFG.warmup_steps, PCFG.max_steps - 1)
    decay_steps = max(PCFG.max_steps, warmup + 1)
    if step < warmup:
        return PCFG.learning_rate * step / warmup
    frac = (step - warmup) / max(decay_steps - warmup, 1)
    frac = min(frac, 1.0)
    return PCFG.learning_rate * 0.5 * (1 + math.cos(math.pi * frac))


def annealed(step):
    if step >= PCFG.ema_anneal_end_step:
        return PCFG.ema_end_decay
    frac = step / PCFG.ema_anneal_end_step
    return PCFG.ema_end_decay - (PCFG.ema_end_decay - PCFG.ema_decay) * (1 - frac)


def torch_update(p, ema, adam_m, adam_v, step, wav, info, opt_count):
    """One full d2v update. Returns loss components; mutates p/ema/adam_*."""
    x_local = local_features(p, wav)

    # teacher: unmasked, EMA main blocks, no grad
    with torch.no_grad():
        ema_det = {k: v for k, v in ema.items()}
        xt = x_local.detach() + positional(p, x_local.detach())
        _, layer_ts = contextualize(p, xt, main_params={**{k: v.detach() for k, v in p.items()}, **ema_det})
        y = make_targets_t(layer_ts)

    mask = to_t(info.mask.astype(np.float32))
    ids_keep = torch.from_numpy(np.asarray(info.ids_keep, np.int64))
    ids_restore = torch.from_numpy(np.asarray(info.ids_restore, np.int64))

    x_masked = x_local * (1.0 - mask.unsqueeze(-1))
    x_pos = positional(p, x_masked)
    gather = lambda z, ids: torch.gather(
        z, 1, ids.unsqueeze(-1).expand(-1, -1, z.shape[-1])
    )
    x_kept = gather(x_masked, ids_keep) + gather(x_pos, ids_keep)
    x_enc, _ = contextualize(p, x_kept)
    # restore with zero mask tokens (mask_noise_std=0)
    fill = torch.zeros(B, TF - x_enc.shape[1], x_enc.shape[2])
    dec_in = torch.gather(
        torch.cat([x_enc, fill], dim=1), 1,
        ids_restore.unsqueeze(-1).expand(-1, -1, x_enc.shape[-1]),
    )
    pred = decoder_fwd(p, dec_in)

    loss_frame = d2v_loss_t(pred, y, mask)
    pred_utt = pred.mean(dim=1)
    y_utt = y.mean(dim=1)
    loss_utt = d2v_loss_t(pred_utt, y_utt, torch.ones(B))
    total = PCFG.d2v_loss * loss_frame + PCFG.cls_loss * loss_utt

    # clipped AdamW (optax chain: clip_by_global_norm -> adamw(schedule))
    for t_ in p.values():
        if t_.grad is not None:
            t_.grad = None
    total.backward()
    grads = {k: (t_.grad if t_.grad is not None else torch.zeros_like(t_))
             for k, t_ in p.items()}
    gnorm = torch.sqrt(sum((g**2).sum() for g in grads.values()))
    clip = min(1.0, 4.0 / max(float(gnorm), 1e-12))
    lr = lr_at(opt_count)
    b1, b2 = 0.9, 0.98
    eps, wd = 1e-8, 0.01
    with torch.no_grad():
        for k, t_ in p.items():
            g = grads[k] * clip
            adam_m[k] = b1 * adam_m[k] + (1 - b1) * g
            adam_v[k] = b2 * adam_v[k] + (1 - b2) * g * g
            mhat = adam_m[k] / (1 - b1 ** (opt_count + 1))
            vhat = adam_v[k] / (1 - b2 ** (opt_count + 1))
            t_ -= lr * (mhat / (torch.sqrt(vhat) + eps) + wd * t_)
        # EMA of the main blocks with the pre-increment step's decay
        decay = annealed(step)
        for k in ema:
            ema[k] = decay * ema[k] + (1 - decay) * p[k].detach().clone()
    return float(total), float(loss_frame), float(loss_utt)


def test_full_d2v_update_matches_torch_replica(rng):
    cfg, pcfg = ENC, PCFG
    model, tx, state = init_d2v_state(cfg, pcfg, jax.random.PRNGKey(0),
                                      example_len=T)
    step_fn = make_d2v_train_step(model, tx)

    p = flat_params(state.params, grad=True)
    ema = {}
    for blk, sub in state.ema_blocks.items():
        def walk(d, pre):
            for k, v in d.items():
                if isinstance(v, dict):
                    walk(v, pre + k + "/")
                else:
                    ema[pre + k] = to_t(v)
        walk(sub, blk + "/")
    adam_m = {k: torch.zeros_like(v) for k, v in p.items()}
    adam_v = {k: torch.zeros_like(v) for k, v in p.items()}

    wav_np = rng.normal(size=(B, T)).astype(np.float32) * 0.3
    pad = np.zeros((B, T), bool)

    jax_losses, torch_losses = [], []
    for t in range(12):
        key = jax.random.PRNGKey(100 + t)
        # shared mask draw: same derivation the step uses internally
        k_mask = jax.random.split(key, 6)[0]
        mask, n_masked = dm.sample_span_mask(
            k_mask, B, TF, pcfg.mask_prob, pcfg.mask_length,
            pcfg.inverse_mask, lengths=jnp.full((B,), TF),
        )
        info = dm.make_mask_info(mask, n_masked)
        info_np = dm.MaskInfo(
            mask=np.asarray(mask), ids_keep=np.asarray(info.ids_keep),
            ids_restore=np.asarray(info.ids_restore),
        )

        state, metrics = step_fn(state, wav_np, pad, key)
        jax_losses.append(float(metrics["loss"]))
        tot, _f, _u = torch_update(p, ema, adam_m, adam_v, t, to_t(wav_np),
                                   info_np, opt_count=t)
        torch_losses.append(tot)

    jax_losses = np.asarray(jax_losses)
    torch_losses = np.asarray(torch_losses)
    # step 0 is pre-update: must agree tightly; trajectories track within
    # f32 optimization drift after 12 coupled updates
    assert abs(jax_losses[0] - torch_losses[0]) < 1e-4, (
        jax_losses[0], torch_losses[0])
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-3, atol=5e-4)
    # the update is live: losses move together step to step (not constants)
    assert np.std(jax_losses) > 1e-3

    # trained parameters track too (not just the scalar losses)
    p_jax = flat_params(state.params, grad=False)
    diffs = {
        k: float((p[k].detach() - p_jax[k]).abs().max()) for k in p_jax
    }
    worst = max(diffs, key=diffs.get)
    assert diffs[worst] < 5e-4, (worst, diffs[worst])
    # EMA teacher blocks track
    ema_jax = {}
    for blk, sub in state.ema_blocks.items():
        def walk(d, pre):
            for k, v in d.items():
                if isinstance(v, dict):
                    walk(v, pre + k + "/")
                else:
                    ema_jax[pre + k] = to_t(v)
        walk(sub, blk + "/")
    w2 = max(float((ema[k] - ema_jax[k]).abs().max()) for k in ema_jax)
    assert w2 < 5e-4, w2
