"""E2E value of self-supervised pretraining: d2v-pretrain -> export ->
extract -> downstream, with the pretrained encoder REQUIRED to beat a
random-init encoder on noisy-domain accuracy (VERDICT r2 gap #4b; the
reference's whole pipeline stands on the emotion2vec_base.pt lineage,
upstream/models/base.py:74-519).

Task design: the class is the temporal ORDER of two tones (ascending /
descending / flat-low / flat-high). Mean pooling destroys order for a
random encoder (its noisy-domain probe sits near chance), while the d2v
objective — predicting masked context — builds order-sensitive features
that survive 5 dB noise. Everything is seeded, so the margin is
deterministic on CPU (measured ~0.33 random vs ~0.78 pretrained).

Scale note (documented in PARITY.md): at this tiny scale the DOWNSTREAM
PROBE is the right instrument; the 8-unit DAD head under-fits this task
with either encoder, so a DAD-accuracy comparison measures the head, not
the encoder. The DAD stage is still run on the pretrained features to
prove the full d2v->extract->DAD plumbing end-to-end.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.noise import (
    add_white_noise_np,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
    write_wav,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    EncoderConfig,
    dad_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.manifests import (
    build_emodb_manifest,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data.wavstore import (
    load_wav_store,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.emotion2vec import (
    Emotion2vecEncoder,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.extract import (
    FeatureExtractor,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
    load_pretrained_encoder,
    run_d2v_pretrain,
)

from test_d2v_pretrain import TINY_DEC, tiny_pcfg

SPK = ["03", "08", "09", "10", "11", "12", "13", "14", "15", "16"]
CODES = "ATNL"
N = 2048


def _clip_for(c, rng):
    half = N // 2
    f_lo = 300.0 * (1 + 0.03 * rng.normal())
    f_hi = 900.0 * (1 + 0.03 * rng.normal())
    t1 = np.arange(half) / 16000.0
    t2 = np.arange(N - half) / 16000.0
    pair = [(f_lo, f_hi), (f_hi, f_lo), (f_lo, f_lo), (f_hi, f_hi)][c]
    wav = np.concatenate(
        [0.3 * np.sin(2 * np.pi * pair[0] * t1),
         0.3 * np.sin(2 * np.pi * pair[1] * t2)]
    )
    return (wav + 0.02 * rng.normal(size=N)).astype(np.float32)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("d2v_downstream"))
    root = os.path.join(tmp, "wav")
    os.makedirs(root)
    rng = np.random.default_rng(0)
    for spk in SPK:
        for j in range(12):
            c = j % 4
            write_wav(
                os.path.join(root, f"{spk}a{j % 7}{CODES[c]}a{j:02d}.wav"),
                _clip_for(c, rng), 16000,
            )
    manifest = os.path.join(tmp, "manifests")
    build_emodb_manifest(root, manifest)

    cfg = EncoderConfig(
        embed_dim=16, depth=2, num_heads=2, prenet_depth=1,
        conv_feature_layers=((8, 4, 2), (8, 3, 2)),
        conv_pos_width=6, conv_pos_groups=2, conv_pos_depth=2,
        dtype="float32", use_flash_attention=False,
    )
    pcfg = tiny_pcfg(
        crop_size=N, min_sample_size=1000, batch_size=8, max_steps=300,
        warmup_steps=10, clone_batch=2, learning_rate=3e-3, mask_prob=0.5,
        mask_length=3, decoder=TINY_DEC,
    )
    run_d2v_pretrain(cfg, pcfg, [manifest], os.path.join(tmp, "d2v"),
                     log_every=100, checkpoint_every=0)
    return tmp, manifest, cfg


def _probe_noisy_acc(cfg, params, ws, noisy_wavs):
    from sklearn.linear_model import LogisticRegression

    ex = FeatureExtractor(cfg, params, batch_size=8, buckets=(N, 2 * N))
    Xc = np.stack([f.mean(0) for f in ex.extract_clips(ws.clips())])
    Xn = np.stack([f.mean(0) for f in ex.extract_clips(noisy_wavs)])
    y = ws.labels
    groups = np.asarray([str(g)[-2:] for g in ws.groups])
    accs = []
    for test_spk in ("03", "08", "09"):
        tr = groups != test_spk
        clf = LogisticRegression(max_iter=3000).fit(Xc[tr], y[tr])
        accs.append(clf.score(Xn[~tr], y[~tr]))
    return float(np.mean(accs))


def test_d2v_pretraining_beats_random_init_downstream(setup):
    tmp, manifest, cfg = setup
    label_map = dad_preset("emodb").label_map
    ws = load_wav_store(manifest, label_map)
    pre_params = load_pretrained_encoder(os.path.join(tmp, "d2v"), cfg)
    enc = Emotion2vecEncoder(cfg)
    rand_params = enc.init(jax.random.PRNGKey(7),
                           np.zeros((1, N), np.float32), np.ones((1, N), bool))

    noisy_wavs = [
        add_white_noise_np(ws.clip(i).astype(np.float64), 5.0,
                           np.random.default_rng((42, i))).astype(np.float32)
        for i in range(ws.num)
    ]
    acc_rand = _probe_noisy_acc(cfg, rand_params, ws, noisy_wavs)
    acc_pre = _probe_noisy_acc(cfg, pre_params, ws, noisy_wavs)
    # measured ~0.33 vs ~0.78; require a decisive margin
    assert acc_pre >= acc_rand + 0.15, (acc_rand, acc_pre)
    assert acc_pre > 0.5


def test_d2v_export_feeds_dad_end_to_end(setup):
    """Mechanics: the exported encoder drives extract -> DAD unchanged,
    producing the standard artifact set."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.dad_trainer import (
        CrossDomainTrainer,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.fused_trainer import (
        store_from_clips,
    )
    from dataclasses import replace

    tmp, manifest, cfg = setup
    label_map = dad_preset("emodb").label_map
    ws = load_wav_store(manifest, label_map)
    pre_params = load_pretrained_encoder(os.path.join(tmp, "d2v"), cfg)
    ex = FeatureExtractor(cfg, pre_params, batch_size=8, buckets=(N, 2 * N))
    clean = store_from_clips(ex.extract_clips(ws.clips()), ws, cfg.embed_dim)
    noisy_wavs = [
        add_white_noise_np(ws.clip(i).astype(np.float64), 5.0,
                           np.random.default_rng((42, i))).astype(np.float32)
        for i in range(ws.num)
    ]
    noisy = store_from_clips(ex.extract_clips(noisy_wavs), ws, cfg.embed_dim)

    dcfg = dad_preset(
        "emodb", batch_size=8, epochs=2, warmup_epochs=1, ecda_start_epoch=1,
        hidden_dim=8, validation_interval=1,
        results_base_dir=os.path.join(tmp, "dad"),
    )
    dcfg = replace(dcfg, clean_data_dir="clean",
                   noisy_data_dir="root1-white-5db")
    trainer = CrossDomainTrainer(dcfg, fold=0, clean_store=clean,
                                 noisy_store=noisy, prefetch_depth=0)
    trainer.train()
    reports = os.path.join(trainer.results_dir, "reports")
    assert os.path.exists(os.path.join(reports, "training_history.json"))
