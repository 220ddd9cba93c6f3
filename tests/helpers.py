"""Shared synthetic-corpus builders for tests."""

import numpy as np

import robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu as dad_tpu
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.store import (
    write_feature_store,
)

IEMOCAP_LABELS = ["ang", "hap", "neu", "sad"]
GENERIC_LABELS = ["angry", "happy", "neutral", "sad"]


def make_iemocap_dir(tmp_path, n=40, dim=8, seed=0, min_len=4, max_len=24):
    """Synthetic IEMOCAP-style feature dir with .emo sidecar and session ids
    spread over 1..5."""
    rng = np.random.default_rng(seed)
    clips, labels, names = [], [], []
    for i in range(n):
        t = int(rng.integers(min_len, max_len))
        clips.append(rng.normal(size=(t, dim)).astype(np.float32))
        labels.append(IEMOCAP_LABELS[i % 4])
        session = (i % 5) + 1
        names.append(f"Ses0{session}F_impro0{i % 9}_F{i:03d}")
    d = str(tmp_path)
    write_feature_store(d, clips, labels=labels, utt_names=names, sidecar="emo")
    return d, clips, labels, names


def make_spk_dir(tmp_path, speakers, n_per_spk=10, dim=8, seed=0, labels=None):
    """Synthetic CASIA/EMODB-style dir with .lbl/.spk sidecars."""
    labels = labels or GENERIC_LABELS
    rng = np.random.default_rng(seed)
    clips, lbls, spks = [], [], []
    for spk in speakers:
        for i in range(n_per_spk):
            t = int(rng.integers(4, 24))
            clips.append(rng.normal(size=(t, dim)).astype(np.float32))
            lbls.append(labels[i % 4])
            spks.append(spk)
    d = str(tmp_path)
    write_feature_store(d, clips, labels=lbls, speakers=spks, sidecar="lbl")
    return d, clips, lbls, spks
