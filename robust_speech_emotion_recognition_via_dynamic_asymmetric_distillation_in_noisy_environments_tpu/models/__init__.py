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
from .d2v_pretrain import (
    D2vPretrainModel,
    D2vTrainState,
    Decoder1d,
    encoder_params,
    init_d2v_state,
    make_d2v_train_step,
)

__all__ = [
    "D2vPretrainModel",
    "D2vTrainState",
    "Decoder1d",
    "encoder_params",
    "init_d2v_state",
    "make_d2v_train_step",
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
