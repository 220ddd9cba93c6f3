"""Checkpoint converters: torch/fairseq <-> flax param trees.

Three checkpoint families exist in the reference's weight lineage
(SURVEY.md §5 checkpoint/resume):

1. ``emotion2vec_base.pt`` — fairseq Data2VecMultiModel dict (~90M params);
   only the features_only submodules are mapped (EMA/decoder/extra-token
   weights of the pretraining branches are skipped).
2. pretrain head ``best_model_fold_N.ckpt`` — raw state_dict with
   ``pre_net.*`` / ``post_net.*`` (pretrain model.py:4-21).
3. DAD ``*.pth`` — ``model_state_dict`` holding ``student_*`` / ``teacher_*``
   module trees (DAD train.py:581-592).

Import and export are both supported so the reference's analysis scripts can
consume checkpoints produced here.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

from ..configs import EncoderConfig
from .heads import SSRLState


def _t(x) -> np.ndarray:
    """torch tensor / array -> numpy array."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Loads a torch checkpoint into {key: np.ndarray}, unwrapping the
    fairseq {'model': ...} / trainer {'model_state_dict': ...} nestings."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model", "model_state_dict", "state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: _t(v) for k, v in obj.items() if hasattr(v, "shape")}


# ---------------------------------------------------------------------------
# emotion2vec encoder
# ---------------------------------------------------------------------------

_AUDIO = "modality_encoders.AUDIO."

# Weights of the d2v-pretraining machinery that real emotion2vec_base.pt
# checkpoints carry but the features_only inference path never touches
# (reference base.py:74-683, emotion2vec.py:87; see PARITY.md dead-branch
# ledger). The converter must skip them silently — and must NOT silently
# skip anything else.
_DEAD_WEIGHT_MARKERS = (
    "_ema",
    ".decoder.",
    "decoder.",
    "alibi_scale",
    "alibi",
    "mask_emb",
    "mask_token",
    "ema.",
    "final_proj",
    "recon_proj",
    "project_q",
    "cls_emb",
    "fixed_positional_encoder",
    "num_updates",
)


def _is_dead_weight(key: str) -> bool:
    return any(m in key for m in _DEAD_WEIGHT_MARKERS)


def fairseq_to_flax_encoder(
    sd: Mapping[str, np.ndarray], cfg: EncoderConfig, strict: bool = True
) -> Dict[str, Any]:
    """Maps a fairseq Data2VecMultiModel state dict onto the
    ``Emotion2vecEncoder`` param tree. Layouts converted:

    - conv1d weight (out, in/groups, k) -> (k, in/groups, out)
    - linear weight (out, in) -> (in, out)

    ``strict`` audits the conversion against real-checkpoint hazards:
    every source key must be either consumed by the mapping or a known
    pretraining-only dead weight (``_DEAD_WEIGHT_MARKERS``) — any other
    leftover raises. Mapped arrays are also shape-checked against the
    flax module's ``jax.eval_shape`` init, so a wrong-config checkpoint
    fails loudly instead of at first apply.
    """
    consumed = set()

    def get(key):
        consumed.add(key)
        return sd[key]

    def lin(prefix):
        return {
            "kernel": _t(get(prefix + ".weight")).T,
            "bias": _t(get(prefix + ".bias")),
        }

    def conv(prefix, bias=True):
        out = {"kernel": _t(get(prefix + ".weight")).transpose(2, 1, 0)}
        if bias:
            out["bias"] = _t(get(prefix + ".bias"))
        return out

    def ln(prefix):
        return {
            "scale": _t(get(prefix + ".weight")),
            "bias": _t(get(prefix + ".bias")),
        }

    params: Dict[str, Any] = {}

    # local conv extractor: conv_layers.{i}.0 = conv, .2.1 = Fp32LayerNorm
    local: Dict[str, Any] = {}
    for i in range(len(cfg.conv_feature_layers)):
        base = f"{_AUDIO}local_encoder.conv_layers.{i}"
        local[f"conv_{i}"] = conv(f"{base}.0", bias=False)
        local[f"ln_{i}"] = ln(f"{base}.2.1")
    params["local_encoder"] = local

    # project_features: [TransposeLast, LayerNorm, Linear]
    params["proj_ln"] = ln(f"{_AUDIO}project_features.1")
    params["proj"] = lin(f"{_AUDIO}project_features.2")

    # relative positional encoder: Sequential(TransposeLast, block*depth,
    # TransposeLast); block i lives at index i+1, conv at .0 (LN is affine-free)
    pos: Dict[str, Any] = {}
    for i in range(cfg.conv_pos_depth):
        pos[f"pos_conv_{i}"] = conv(
            f"{_AUDIO}relative_positional_encoder.{i + 1}.0"
        )
    params["pos_conv"] = pos

    def block(src_prefix):
        return {
            "norm1": ln(f"{src_prefix}.norm1"),
            "norm2": ln(f"{src_prefix}.norm2"),
            "attn": {
                "qkv": lin(f"{src_prefix}.attn.qkv"),
                "proj": lin(f"{src_prefix}.attn.proj"),
            },
            "mlp": {
                "fc1": lin(f"{src_prefix}.mlp.fc1"),
                "fc2": lin(f"{src_prefix}.mlp.fc2"),
            },
        }

    # prenet: context_encoder.norm applied pre-blocks (post-LN config)
    params["prenet_ln"] = ln(f"{_AUDIO}context_encoder.norm")
    for i in range(cfg.prenet_depth):
        params[f"prenet_block_{i}"] = block(
            f"{_AUDIO}context_encoder.blocks.{i}"
        )
    for i in range(cfg.depth):
        params[f"block_{i}"] = block(f"blocks.{i}")

    out = {"params": params}
    if strict:
        leftover = [k for k in sd if k not in consumed]
        unknown = sorted(k for k in leftover if not _is_dead_weight(k))
        if unknown:
            raise ValueError(
                "fairseq checkpoint carries keys the converter does not "
                f"recognize (not mapped, not known-dead): {unknown[:10]}"
                + (f" ... +{len(unknown) - 10} more" if len(unknown) > 10 else "")
            )
        _check_shapes_against_module(out, cfg)
    return out


def _check_shapes_against_module(converted: Dict[str, Any], cfg: EncoderConfig):
    """Raises if any converted array's shape differs from the flax module's
    initialization shapes (computed shape-only via jax.eval_shape)."""
    import jax
    import jax.numpy as jnp

    from .emotion2vec import Emotion2vecEncoder

    model = Emotion2vecEncoder(cfg)
    expected = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 2048), jnp.float32)),
        jax.random.PRNGKey(0),
    )
    exp_shapes = tree_shapes(expected)
    got_shapes = tree_shapes(converted)
    bad = [
        f"{path}: checkpoint {got_shapes.get(path)} vs module {shape}"
        for path, shape in exp_shapes.items()
        if got_shapes.get(path) != tuple(shape)
    ]
    missing = [p for p in exp_shapes if p not in got_shapes]
    if bad or missing:
        raise ValueError(
            f"checkpoint/config shape mismatch: {bad[:5]} missing={missing[:5]}"
        )


def load_emotion2vec_checkpoint(path: str, cfg: EncoderConfig) -> Dict[str, Any]:
    return fairseq_to_flax_encoder(load_torch_file(path), cfg)


# ---------------------------------------------------------------------------
# pretrain head (pre_net / post_net)
# ---------------------------------------------------------------------------

def torch_to_flax_pretrain_head(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    return {
        "params": {
            "pre_net": {
                "kernel": _t(sd["pre_net.weight"]).T,
                "bias": _t(sd["pre_net.bias"]),
            },
            "post_net": {
                "kernel": _t(sd["post_net.weight"]).T,
                "bias": _t(sd["post_net.bias"]),
            },
        }
    }


def flax_pretrain_head_to_torch(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    p = params["params"]
    return {
        "pre_net.weight": np.asarray(p["pre_net"]["kernel"]).T,
        "pre_net.bias": np.asarray(p["pre_net"]["bias"]),
        "post_net.weight": np.asarray(p["post_net"]["kernel"]).T,
        "post_net.bias": np.asarray(p["post_net"]["bias"]),
    }


def load_pretrain_head_checkpoint(path: str) -> Dict[str, Any]:
    return torch_to_flax_pretrain_head(load_torch_file(path))


# ---------------------------------------------------------------------------
# DAD SSRL checkpoints (student_* / teacher_* torch module trees)
# ---------------------------------------------------------------------------

def ssrl_to_torch_state_dict(state: SSRLState) -> Dict[str, np.ndarray]:
    """Exports to the reference SSRLModel state_dict layout so the reference
    analysis/inference scripts can load our checkpoints."""

    def one(tree, role):
        p = tree["params"]
        return {
            f"{role}_encoder.pre_net.weight": np.asarray(
                p["encoder"]["pre_net"]["kernel"]
            ).T,
            f"{role}_encoder.pre_net.bias": np.asarray(
                p["encoder"]["pre_net"]["bias"]
            ),
            f"{role}_classifier.fc_layer.weight": np.asarray(
                p["classifier"]["fc_layer"]["kernel"]
            ).T,
            f"{role}_classifier.fc_layer.bias": np.asarray(
                p["classifier"]["fc_layer"]["bias"]
            ),
        }

    out = one(state.student, "student")
    out.update(one(state.teacher, "teacher"))
    return out


def torch_state_dict_to_ssrl(sd: Mapping[str, np.ndarray]) -> SSRLState:
    def one(role):
        return {
            "params": {
                "encoder": {
                    "pre_net": {
                        "kernel": _t(sd[f"{role}_encoder.pre_net.weight"]).T,
                        "bias": _t(sd[f"{role}_encoder.pre_net.bias"]),
                    }
                },
                "classifier": {
                    "fc_layer": {
                        "kernel": _t(sd[f"{role}_classifier.fc_layer.weight"]).T,
                        "bias": _t(sd[f"{role}_classifier.fc_layer.bias"]),
                    }
                },
            }
        }

    return SSRLState(student=one("student"), teacher=one("teacher"))


def save_torch_file(obj: Mapping[str, Any], path: str) -> None:
    import torch

    torch.save(
        {
            k: torch.from_numpy(np.array(v)) if hasattr(v, "shape") else v
            for k, v in obj.items()
        },
        path,
    )


_NUMERIC_RE = re.compile(r"^\d+$")


def tree_shapes(tree: Any, prefix: str = "") -> Dict[str, tuple]:
    """Debug helper: flattened {path: shape} of a param tree."""
    out = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(tree_shapes(v, f"{prefix}/{k}" if prefix else str(k)))
    elif hasattr(tree, "shape"):
        out[prefix] = tuple(tree.shape)
    else:
        out[prefix] = tuple(np.shape(tree))
    return out
