from .emotion2vec import (
    Emotion2vecEncoder,
    extract_features,
    init_encoder,
    normalize_wav,
)
from .heads import (
    DADClassifier,
    DADEncoder,
    DADHead,
    PretrainHead,
    SSRLState,
    ema_update,
    init_ssrl,
    load_pretrain_into_ssrl,
)
from .layers import AltAttention, AltBlock, ConvFeatureExtractor, PositionalConv

__all__ = [
    "Emotion2vecEncoder",
    "extract_features",
    "init_encoder",
    "normalize_wav",
    "PretrainHead",
    "DADEncoder",
    "DADClassifier",
    "DADHead",
    "SSRLState",
    "ema_update",
    "init_ssrl",
    "load_pretrain_into_ssrl",
    "AltAttention",
    "AltBlock",
    "ConvFeatureExtractor",
    "PositionalConv",
]
