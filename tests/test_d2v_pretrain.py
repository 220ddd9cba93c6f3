"""d2v self-supervised pretraining tests: masking machinery vs torch oracles,
Decoder1d parity, target normalization, EMA annealing, train-step smoke, and
encoder param-tree compatibility with the extraction encoder."""

import os

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
    Decoder1d,
    annealed_decay,
    compute_var,
    d2v_loss,
    encoder_params,
    init_d2v_state,
    make_d2v_train_step,
    make_targets,
    merge_teacher_params,
)

TINY_ENC = dict(
    embed_dim=16,
    depth=3,
    num_heads=2,
    prenet_depth=1,
    conv_feature_layers=((8, 4, 2), (8, 3, 2)),
    conv_pos_depth=2,
    conv_pos_width=10,
    conv_pos_groups=2,
    dtype="float32",
)
TINY_DEC = D2vDecoderConfig(
    decoder_dim=8, decoder_groups=2, decoder_kernel=3, decoder_layers=2
)


def tiny_pcfg(**kw):
    base = dict(
        clone_batch=2,
        average_top_k_layers=2,
        mask_length=3,
        decoder=TINY_DEC,
        warmup_steps=2,
        max_steps=50,
        batch_size=4,
        crop_size=64,
    )
    base.update(kw)
    return D2vPretrainConfig(**base)


# ---------------------------------------------------------------------------
# masking
# ---------------------------------------------------------------------------
def test_random_mask_exact_count():
    mask, n = dm.sample_random_mask(jax.random.PRNGKey(0), 8, 20, 0.6)
    assert n == 20 - int(20 * 0.4)
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), n)


def test_span_mask_exact_count_and_spans():
    mask, n = dm.sample_span_mask(jax.random.PRNGKey(1), 16, 40, 0.5, 4)
    m = np.asarray(mask)
    np.testing.assert_array_equal(m.sum(axis=1), n)
    # every row must contain at least one full span of mask_length
    for row in m:
        runs = np.diff(np.flatnonzero(np.diff(np.r_[0, row.view(np.int8), 0])))
        assert runs[::2].max() >= 4


def test_span_mask_inverse():
    mask, n = dm.sample_span_mask(
        jax.random.PRNGKey(2), 4, 30, 0.7, 5, inverse_mask=True
    )
    m = np.asarray(mask)
    np.testing.assert_array_equal(m.sum(axis=1), n)
    # inverse masking keeps (1-p) spans, i.e. the UNMASKED region is spanny
    keep = ~m
    for row in keep:
        runs = np.diff(np.flatnonzero(np.diff(np.r_[0, row.view(np.int8), 0])))
        assert runs[::2].max() >= 5


def test_mask_info_matches_torch_mae_semantics(rng):
    """make_mask_info + gathers reproduce the reference MAE bookkeeping
    (base.py:412-440, 486-535): torch gathers with argsort'd uint8 masks."""
    B, T, D = 3, 12, 5
    mask, n = dm.sample_random_mask(jax.random.PRNGKey(3), B, T, 0.5)
    info = dm.make_mask_info(mask, n)
    x = rng.normal(size=(B, T, D)).astype(np.float32)

    tm = torch.from_numpy(np.asarray(mask)).to(torch.uint8)
    ids_shuffle = torch.argsort(tm, dim=1, stable=True)
    ids_restore = torch.argsort(ids_shuffle, dim=1)
    len_keep = T - n
    t_keep = ids_shuffle[:, :len_keep]
    x_unmasked = torch.gather(
        torch.from_numpy(x), 1, t_keep.unsqueeze(-1).expand(-1, -1, D)
    )
    np.testing.assert_array_equal(np.asarray(info.ids_keep), t_keep.numpy())
    np.testing.assert_array_equal(np.asarray(info.ids_restore), ids_restore.numpy())
    got_unmasked = dm.gather_unmasked(jnp.asarray(x), info)
    np.testing.assert_allclose(np.asarray(got_unmasked), x_unmasked.numpy())
    # kept tokens stay in temporal order
    assert np.all(np.diff(np.asarray(info.ids_keep), axis=1) > 0)


def test_restore_with_zero_tokens_roundtrip(rng):
    B, T, D = 2, 10, 4
    mask, n = dm.sample_random_mask(jax.random.PRNGKey(4), B, T, 0.3)
    info = dm.make_mask_info(mask, n)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    kept = dm.gather_unmasked(x, info)
    restored = dm.restore_with_mask_tokens(kept, info, 0.0, jax.random.PRNGKey(0))
    want = np.asarray(x) * (1 - np.asarray(mask)[..., None])
    np.testing.assert_allclose(np.asarray(restored), want, atol=1e-6)


def test_apply_mask_zero_and_noise(rng):
    B, T, D = 2, 8, 3
    mask, n = dm.sample_random_mask(jax.random.PRNGKey(5), B, T, 0.5)
    info = dm.make_mask_info(mask, n)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    z = dm.apply_mask(x, info, encoder_zero_mask=True)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(x) * (1 - np.asarray(mask)[..., None])
    )
    nz = dm.apply_mask(
        x, info, encoder_zero_mask=False, mask_noise_std=0.01,
        noise_key=jax.random.PRNGKey(6),
    )
    m = np.asarray(mask)[..., None].astype(bool)
    np.testing.assert_allclose(np.asarray(nz)[~m.repeat(D, -1)],
                               np.asarray(x)[~m.repeat(D, -1)])
    assert np.abs(np.asarray(nz)[m.repeat(D, -1)]).max() < 0.1


# ---------------------------------------------------------------------------
# decoder parity vs torch
# ---------------------------------------------------------------------------
class TorchDecoder1d(torch.nn.Module):
    """Reference modules.py:126-181 rebuilt in torch as an oracle."""

    def __init__(self, dc, input_dim):
        super().__init__()
        self.dc = dc
        self.blocks = torch.nn.ModuleList()
        for i in range(dc.decoder_layers):
            in_dim = input_dim if i == 0 else dc.decoder_dim
            self.blocks.append(
                torch.nn.Conv1d(
                    in_dim, dc.decoder_dim, dc.decoder_kernel,
                    padding=dc.decoder_kernel // 2, groups=dc.decoder_groups,
                )
            )
        self.proj = torch.nn.Linear(dc.decoder_dim, input_dim)

    def forward(self, x):  # x (B, T, C)
        x = x.transpose(1, 2)
        residual = x
        for blk in self.blocks:
            x = blk(x)
            if self.dc.decoder_kernel % 2 == 0:
                x = x[..., :-1]
            x = F.layer_norm(x.transpose(1, 2), (x.shape[1],)).transpose(1, 2)
            x = F.gelu(x)
            if self.dc.decoder_residual and residual.size(1) == x.size(1):
                x = x + residual
            residual = x
        x = x.transpose(1, 2)
        return self.proj(x)


def test_decoder1d_matches_torch(rng):
    D_in = 8
    dec = Decoder1d(dcfg=TINY_DEC, input_dim=D_in, dtype=jnp.float32)
    x = rng.normal(size=(2, 11, D_in)).astype(np.float32)
    params = dec.init(jax.random.PRNGKey(0), jnp.asarray(x))

    tdec = TorchDecoder1d(TINY_DEC, D_in)
    p = params["params"]
    with torch.no_grad():
        for i in range(TINY_DEC.decoder_layers):
            k = np.asarray(p[f"conv_{i}"]["kernel"])  # (k, in/groups, out)
            tdec.blocks[i].weight.copy_(torch.from_numpy(k.transpose(2, 1, 0)))
            tdec.blocks[i].bias.copy_(torch.from_numpy(np.asarray(p[f"conv_{i}"]["bias"])))
        tdec.proj.weight.copy_(
            torch.from_numpy(np.asarray(p["proj_out"]["kernel"]).T)
        )
        tdec.proj.bias.copy_(torch.from_numpy(np.asarray(p["proj_out"]["bias"])))
        want = tdec(torch.from_numpy(x)).numpy()
    got = np.asarray(dec.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# targets / losses / ema
# ---------------------------------------------------------------------------
def test_make_targets_instance_norm_matches_torch(rng):
    pcfg = tiny_pcfg(average_top_k_layers=2, instance_norm_target_layer=True)
    layers = [rng.normal(size=(2, 7, 6)).astype(np.float32) for _ in range(3)]
    got = np.asarray(make_targets([jnp.asarray(l) for l in layers], pcfg))
    tl = [
        F.instance_norm(torch.from_numpy(l).transpose(1, 2)).transpose(1, 2)
        for l in layers[-2:]
    ]
    want = (sum(tl) / 2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_make_targets_layer_norm_variants(rng):
    pcfg = tiny_pcfg(
        average_top_k_layers=2,
        instance_norm_target_layer=False,
        layer_norm_target_layer=True,
        layer_norm_targets=True,
    )
    layers = [rng.normal(size=(2, 5, 6)).astype(np.float32) for _ in range(2)]
    got = np.asarray(make_targets([jnp.asarray(l) for l in layers], pcfg))
    tl = [F.layer_norm(torch.from_numpy(l), (6,)) for l in layers]
    want = F.layer_norm(sum(tl) / 2, (6,)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_d2v_loss_l2_and_smooth_l1(rng):
    pred = rng.normal(size=(3, 4, 6)).astype(np.float32)
    tgt = rng.normal(size=(3, 4, 6)).astype(np.float32)
    w = np.ones((3, 4), np.float32)
    got = float(d2v_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(w), 0.0, None))
    want = float(
        (F.mse_loss(torch.from_numpy(pred), torch.from_numpy(tgt),
                    reduction="none").sum(-1) / np.sqrt(6)).mean()
    )
    assert abs(got - want) < 1e-5
    got_b = float(d2v_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(w), 0.5, 2.0))
    want_b = float(
        (F.smooth_l1_loss(torch.from_numpy(pred), torch.from_numpy(tgt),
                          reduction="none", beta=0.5).sum(-1) * 2.0).mean()
    )
    assert abs(got_b - want_b) < 1e-5


def test_annealed_decay_matches_reference():
    # reference base.py:477-482 get_annealed_rate
    def oracle(start, end, curr, total):
        if curr >= total:
            return end
        r = end - start
        return end - r * (1 - curr / total)

    pcfg = tiny_pcfg(ema_decay=0.999, ema_end_decay=0.9999,
                     ema_anneal_end_step=100)
    for step in [0, 1, 50, 99, 100, 500]:
        got = float(annealed_decay(pcfg, jnp.asarray(step)))
        assert abs(got - oracle(0.999, 0.9999, step, 100)) < 1e-7


# ---------------------------------------------------------------------------
# train step + encoder compatibility
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tiny_state():
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg()
    model, tx, state = init_d2v_state(cfg, pcfg, jax.random.PRNGKey(0),
                                      example_len=64)
    return cfg, pcfg, model, tx, state


@pytest.mark.slow
def test_train_step_learns_and_updates_ema(tiny_state, rng):
    cfg, pcfg, model, tx, state = tiny_state
    # the step donates its input state; copy so the module-scoped fixture
    # survives for later tests
    state = jax.tree.map(jnp.copy, state)
    step = make_d2v_train_step(model, tx)
    wav = rng.normal(size=(4, 64)).astype(np.float32)
    pad = np.zeros((4, 64), bool)
    pad[3, 48:] = True
    ema0 = jax.tree.map(np.asarray, state.ema_blocks)
    losses = []
    for i in range(25):
        state, m = step(state, wav, pad, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 25
    assert float(m["target_var"]) > 0.05 and float(m["pred_var"]) > 0.0
    # EMA must have moved but slowly
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.ema_blocks, ema0,
    )
    flat = jax.tree.leaves(moved)
    assert max(flat) > 0 and max(flat) < 0.5


@pytest.mark.slow
def test_mask_channel_prob_masks_channels_and_is_live(tiny_state, rng):
    """mask_channel_prob (base.py:456-469): span-masked channels are zeroed
    with an exact per-row count, and turning the knob on changes the step."""
    # primitive: span mask over the channel dim has an exact count per row
    ch, n = dm.sample_span_mask(jax.random.PRNGKey(0), 6, 16, 0.25, 4)
    assert n == 4
    assert (np.asarray(ch).sum(axis=1) == n).all()

    cfg, pcfg, model, tx, _state = tiny_state
    from dataclasses import replace

    wav = rng.normal(size=(4, 64)).astype(np.float32)
    pad = np.zeros((4, 64), bool)
    key = jax.random.PRNGKey(3)

    losses = {}
    for p in (0.0, 0.5):
        pcfg_p = replace(pcfg, mask_channel_prob=p, mask_channel_length=4)
        model_p, tx_p, state_p = init_d2v_state(
            cfg, pcfg_p, jax.random.PRNGKey(0), example_len=64
        )
        step = make_d2v_train_step(model_p, tx_p)
        _s, m = step(state_p, wav, pad, key)
        losses[p] = float(m["loss"])
        assert np.isfinite(losses[p])
    assert losses[0.0] != losses[0.5]


@pytest.mark.slow
def test_whole_model_ema_teacher_reextracts(tiny_state, rng):
    """ema_encoder_only=False (whole-model EMA): the teacher must compute
    its OWN local features with the EMA'd extractor — after the EMA copies
    drift from the student, the loss differs from the encoder-only mode on
    the same inputs, and the step stays finite."""
    cfg, pcfg, _model, _tx, _state = tiny_state
    from dataclasses import replace

    wav = rng.normal(size=(4, 64)).astype(np.float32)
    pad = np.zeros((4, 64), bool)
    losses = {}
    for flag in (True, False):
        pcfg_f = replace(pcfg, ema_encoder_only=flag, ema_decay=0.5)
        model_f, tx_f, state_f = init_d2v_state(
            cfg, pcfg_f, jax.random.PRNGKey(0), example_len=64
        )
        if not flag:
            assert "local_encoder" in state_f.ema_blocks
        step = make_d2v_train_step(model_f, tx_f)
        # three steps: the warmup schedule makes update 1 a no-op (lr=0),
        # so the EMA extractor only drifts from update 2 onward
        state_f, _ = step(state_f, wav, pad, jax.random.PRNGKey(3))
        state_f, _ = step(state_f, wav, pad, jax.random.PRNGKey(4))
        _s, m = step(state_f, wav, pad, jax.random.PRNGKey(5))
        losses[flag] = float(m["loss"])
        assert np.isfinite(losses[flag])
    assert losses[True] != losses[False]


def test_teacher_params_merge(tiny_state):
    cfg, pcfg, model, tx, state = tiny_state
    tp = merge_teacher_params(state.params, state.ema_blocks)
    assert set(tp["params"].keys()) == set(state.params["params"].keys())
    # non-EMA'd modules must be the student's own arrays
    assert tp["params"]["proj"] is state.params["params"]["proj"]


def test_encoder_params_load_into_extraction_encoder(tiny_state, rng):
    """The pretrained param tree (minus decoder) IS an Emotion2vecEncoder
    checkpoint — and produces the same features as the d2v model's unmasked
    forward."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.emotion2vec import (
        Emotion2vecEncoder,
    )

    cfg, pcfg, model, tx, state = tiny_state
    wav = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    pad = jnp.zeros((2, 64), bool)
    enc = Emotion2vecEncoder(cfg)
    ep = encoder_params(state.params)
    assert "decoder" not in ep["params"]
    feats, fm = enc.apply(ep, wav, pad)
    x_d2v, _pred = model.apply(state.params, wav, pad)
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(x_d2v), atol=1e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_sharded_d2v_step_matches_single(rng):
    """dp-sharded pretraining step == single-device step on the same global
    batch (8 virtual CPU devices; XLA inserts the gradient all-reduce)."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
        make_mesh,
        make_sharded_d2v_step,
        place_d2v_state,
    )

    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(batch_size=8)
    model, tx, state = init_d2v_state(cfg, pcfg, jax.random.PRNGKey(0),
                                      example_len=64)
    wav = rng.normal(size=(8, 64)).astype(np.float32)
    pad = np.zeros((8, 64), bool)
    pad[5, 40:] = True
    key = jax.random.PRNGKey(7)

    step1 = make_d2v_train_step(model, tx)
    # donated input: keep the original state alive for the sharded run
    s1, m1 = step1(jax.tree.map(jnp.copy, state), wav, pad, key)

    mesh = make_mesh(8, tp=1, axis_names=("dp",))
    step8 = make_sharded_d2v_step(model, tx, mesh)
    with mesh:
        s8, m8 = step8(place_d2v_state(state, mesh), wav, pad, key)
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4
    d = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s1.params, s8.params,
    )
    assert max(jax.tree.leaves(d)) < 1e-4


@pytest.mark.slow
def test_sharded_d2v_step_dp_tp_matches_single(rng):
    """dp=2 x tp=4 pretraining step == single-device step: the student
    params, EMA copies, and AdamW moments shard over heads/MLP-hidden
    (place_d2v_state tp layout) while the batch shards over dp; GSPMD
    partitions every block matmul fwd+bwd and the result is numerically
    the single-device update."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
        make_mesh,
        make_sharded_d2v_step,
        place_d2v_state,
    )

    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(batch_size=4)
    model, tx, state = init_d2v_state(cfg, pcfg, jax.random.PRNGKey(0),
                                      example_len=64)
    wav = rng.normal(size=(4, 64)).astype(np.float32)
    pad = np.zeros((4, 64), bool)
    pad[2, 48:] = True
    key = jax.random.PRNGKey(9)

    step1 = make_d2v_train_step(model, tx)
    s1, m1 = step1(jax.tree.map(jnp.copy, state), wav, pad, key)

    mesh = make_mesh(8, tp=4)  # 2 x 4 (dp, tp)
    placed = place_d2v_state(state, mesh)
    # the tp layout actually shards something (qkv kernel over heads)
    qkv = placed.params["params"]["block_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    step8 = make_sharded_d2v_step(model, tx, mesh)
    with mesh:
        s8, m8 = step8(placed, wav, pad, key)
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4
    d = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s1.params, s8.params,
    )
    assert max(jax.tree.leaves(d)) < 1e-4
    # EMA stayed coherent too (it is sharded like the params)
    de = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s1.ema_blocks, s8.ema_blocks,
    )
    assert max(jax.tree.leaves(de)) < 1e-4


def test_compute_var_sane(rng):
    y = rng.normal(size=(4, 6, 8)).astype(np.float32)
    v = float(compute_var(jnp.asarray(y)))
    assert 0.8 < v < 1.2


# ---------------------------------------------------------------------------
# dataset + driver
# ---------------------------------------------------------------------------
def _write_wav_corpus(tmp_path, lens=(4000, 4200, 5000, 6000, 7000, 9000),
                      sr=16000):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.audio.wavio import (
        write_wav,
    )

    root = os.path.join(str(tmp_path), "wavs")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i, ln in enumerate(lens):
        write_wav(os.path.join(root, f"clip{i}.wav"),
                  rng.normal(size=ln) * 0.1, sr)
        rows.append((f"clip{i}.wav", ln))
    with open(os.path.join(str(tmp_path), "train.tsv"), "w") as f:
        print(root, file=f)
        for rel, ln in rows:
            print(f"{rel}\t{ln}", file=f)
    return str(tmp_path)


def test_wav_crop_dataset(tmp_path):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        WavCropDataset,
    )

    d = _write_wav_corpus(tmp_path)
    pcfg = tiny_pcfg(crop_size=6000, min_sample_size=4500, batch_size=2)
    ds = WavCropDataset([d], pcfg)
    assert len(ds) == 4  # the 4000/4200-sample clips are filtered
    batches = list(ds.batches(0, 2))
    assert batches, "expected at least one batch"
    for wav, pad in batches:
        assert wav.shape == (2, 6000) and pad.shape == (2, 6000)
        valid = ~pad
        # normalized crops: ~zero mean/unit var over valid samples
        for r in range(2):
            v = wav[r][valid[r]]
            assert abs(v.mean()) < 0.05 and abs(v.std() - 1) < 0.05
    # weights repeat corpora
    ds2 = WavCropDataset([d, d], pcfg, weights=[2, 1])
    assert len(ds2) == 3 * len(ds)


def test_run_d2v_pretrain_smoke(tmp_path):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        load_pretrained_encoder,
        run_d2v_pretrain,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000))
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(
        crop_size=1500, min_sample_size=1000, batch_size=2, max_steps=4,
        warmup_steps=1, clone_batch=2,
    )
    save = os.path.join(str(tmp_path), "out")
    last = run_d2v_pretrain(cfg, pcfg, [d], save, log_every=2,
                            checkpoint_every=2)
    assert last["step"] >= 4 and np.isfinite(last["loss"])
    assert os.path.exists(os.path.join(save, "d2v_last_state.msgpack"))
    assert os.path.exists(os.path.join(save, "d2v_training_history.json"))
    params = load_pretrained_encoder(save, cfg)
    assert "block_0" in params["params"]


@pytest.mark.slow
def test_run_d2v_pretrain_rbg_and_resume(tmp_path, monkeypatch):
    """rng_impl='rbg' (the TPU-fast generator, PERFORMANCE.md round 3):
    the driver trains, and a crash-interrupted run resumed from the
    checkpoint reproduces the uninterrupted run's history bit-exactly —
    i.e. the typed rbg key round-trips key_data/wrap_key_data. The crash
    pattern (not a shorter max_steps, which would change the cosine
    schedule) mirrors test_run_d2v_pretrain_resume_continues_run."""
    import json

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models import (
        d2v_pretrain as d2v_models,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000))
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(
        crop_size=1500, min_sample_size=1000, batch_size=2,
        max_steps=6, warmup_steps=1, clone_batch=2, rng_impl="rbg",
    )

    ref = os.path.join(str(tmp_path), "ref")
    last = run_d2v_pretrain(cfg, pcfg, [d], ref, log_every=1,
                            checkpoint_every=0)
    assert np.isfinite(last["loss"])

    real_make = d2v_models.make_d2v_train_step

    def crashing_make(model, tx):
        real_step = real_make(model, tx)
        calls = {"n": 0}

        def step(*a, **kw):
            calls["n"] += 1
            if calls["n"] > 3:
                raise RuntimeError("simulated crash")
            return real_step(*a, **kw)

        return step

    res = os.path.join(str(tmp_path), "res")
    monkeypatch.setattr(d2v_models, "make_d2v_train_step", crashing_make)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_d2v_pretrain(cfg, pcfg, [d], res, log_every=1,
                         checkpoint_every=3)
    monkeypatch.setattr(d2v_models, "make_d2v_train_step", real_make)
    run_d2v_pretrain(cfg, pcfg, [d], res, log_every=1, checkpoint_every=0,
                     resume=True)

    h_ref = json.load(open(os.path.join(ref, "d2v_training_history.json")))
    h_res = json.load(open(os.path.join(res, "d2v_training_history.json")))
    assert [e["step"] for e in h_res] == [e["step"] for e in h_ref]
    for a, b in zip(h_ref, h_res):
        assert abs(a["loss"] - b["loss"]) < 1e-5, (a["step"], a, b)


def test_split_chunk_keys_matches_iterated_splits():
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.d2v_pretrain import (
        split_chunk_keys,
    )

    for impl in ("threefry2x32", "rbg"):
        rng = jax.random.key(3, impl=impl)
        r_iter, ks_iter = rng, []
        for _ in range(5):
            r_iter, kk = jax.random.split(r_iter)
            ks_iter.append(kk)
        r_scan, ks_scan = split_chunk_keys(rng, 5)
        assert np.array_equal(jax.random.key_data(r_iter),
                              jax.random.key_data(r_scan))
        assert np.array_equal(
            np.stack([np.asarray(jax.random.key_data(k)) for k in ks_iter]),
            np.asarray(jax.random.key_data(ks_scan)),
        )


@pytest.mark.slow
def test_run_d2v_pretrain_scan_chunk_matches_per_step(tmp_path):
    """scan_chunk=3 over 7 steps (two full chunks + a partial one) produces
    a bit-identical history to the per-step run — one XLA dispatch per
    chunk, same key stream (split_chunk_keys), same logging grid."""
    import json

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000))
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(crop_size=1500, min_sample_size=1000, batch_size=2,
                     max_steps=7, warmup_steps=1, clone_batch=2)

    a = os.path.join(str(tmp_path), "per_step")
    b = os.path.join(str(tmp_path), "chunked")
    run_d2v_pretrain(cfg, pcfg, [d], a, log_every=1, checkpoint_every=0)
    run_d2v_pretrain(cfg, pcfg, [d], b, log_every=1, checkpoint_every=0,
                     scan_chunk=3)
    h_a = json.load(open(os.path.join(a, "d2v_training_history.json")))
    h_b = json.load(open(os.path.join(b, "d2v_training_history.json")))
    assert [e["step"] for e in h_b] == [e["step"] for e in h_a] == list(
        range(1, 8)
    )
    for ea, eb in zip(h_a, h_b):
        for key in ("loss", "d2v_loss", "cls_loss", "target_var", "pred_var"):
            assert abs(ea[key] - eb[key]) < 1e-5, (ea["step"], key, ea, eb)


@pytest.mark.slow
def test_run_d2v_pretrain_validation_tracks_best(tmp_path):
    """--valid-manifests: periodic masked-objective validation (fairseq
    validate()/checkpoint_best analogue) — valid_loss history entries on
    the valid_every grid + at the end, best state kept, best encoder
    exported, and the TRAINING stream untouched (same final train loss as
    a run without validation)."""
    import json

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000))
    import shutil

    shutil.copy2(os.path.join(d, "train.tsv"), os.path.join(d, "valid.tsv"))
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(crop_size=1500, min_sample_size=1000, batch_size=2,
                     max_steps=5, warmup_steps=1, clone_batch=2)

    plain = os.path.join(str(tmp_path), "plain")
    r1 = run_d2v_pretrain(cfg, pcfg, [d], plain, log_every=1,
                          checkpoint_every=0)

    out = os.path.join(str(tmp_path), "val")
    r2 = run_d2v_pretrain(cfg, pcfg, [d], out, log_every=1,
                          checkpoint_every=0, valid_manifests=[d],
                          valid_every=2)
    assert abs(r1["loss"] - r2["loss"]) < 1e-6  # validation is side-effect-free

    h = json.load(open(os.path.join(out, "d2v_training_history.json")))
    vsteps = [e["step"] for e in h if "valid_loss" in e]
    assert vsteps == [2, 4, 5]
    vlosses = [e["valid_loss"] for e in h if "valid_loss" in e]
    assert all(np.isfinite(v) for v in vlosses)
    assert os.path.exists(os.path.join(out, "d2v_best_state.msgpack"))
    assert os.path.exists(os.path.join(out, "encoder_params_best.msgpack"))


@pytest.mark.slow
def test_collapse_guard_aborts_run(tmp_path, monkeypatch):
    """A variance collapse aborts training (reference config.py:77-83).
    Guards are evaluated for every update from step 1; detection is lag-1
    pipelined (PERFORMANCE.md), so a collapse at step 2 stops the run by
    step 3."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models import (
        d2v_pretrain as d2v_models,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000))
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(crop_size=1500, min_sample_size=1000, batch_size=2,
                     max_steps=6, warmup_steps=1, clone_batch=2)

    real_make = d2v_models.make_d2v_train_step

    def collapsing_make(model, tx):
        real_step = real_make(model, tx)
        calls = {"n": 0}

        def step(*a, **kw):
            calls["n"] += 1
            state, metrics = real_step(*a, **kw)
            if calls["n"] == 2:
                metrics = dict(metrics)
                metrics["target_var"] = jnp.zeros(())
            return state, metrics

        return step

    monkeypatch.setattr(d2v_models, "make_d2v_train_step", collapsing_make)
    import shutil

    shutil.copy2(os.path.join(d, "train.tsv"), os.path.join(d, "valid.tsv"))
    save = os.path.join(str(tmp_path), "out")
    last = run_d2v_pretrain(cfg, pcfg, [d], save, log_every=1,
                            checkpoint_every=0, valid_manifests=[d],
                            valid_every=100)
    assert last["step"] <= 2  # aborted; post-collapse steps not logged
    # a collapsed run must never crown a "best" checkpoint
    assert not os.path.exists(os.path.join(save, "d2v_best_state.msgpack"))
    assert not os.path.exists(
        os.path.join(save, "encoder_params_best.msgpack")
    )


@pytest.mark.slow
def test_resume_from_exact_epoch_boundary(tmp_path, monkeypatch):
    """A checkpoint saved on the last batch of an epoch must resume into
    the NEXT epoch, not die with a spurious 'produced no batches' error
    (skip == num_batches makes the resumed epoch's iterator empty)."""
    import json

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models import (
        d2v_pretrain as d2v_models,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    # 4 clips, batch 2 -> 2 batches/epoch; crash right after step 2's
    # checkpoint = an exact epoch boundary
    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000))
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(crop_size=1500, min_sample_size=1000, batch_size=2,
                     max_steps=5, warmup_steps=1, clone_batch=2)

    full = os.path.join(str(tmp_path), "full")
    run_d2v_pretrain(cfg, pcfg, [d], full, log_every=1, checkpoint_every=0)

    real_make = d2v_models.make_d2v_train_step

    def crashing_make(model, tx):
        real_step = real_make(model, tx)
        calls = {"n": 0}

        def step(*a, **kw):
            calls["n"] += 1
            if calls["n"] > 2:
                raise RuntimeError("simulated crash")
            return real_step(*a, **kw)

        return step

    part = os.path.join(str(tmp_path), "part")
    monkeypatch.setattr(d2v_models, "make_d2v_train_step", crashing_make)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_d2v_pretrain(cfg, pcfg, [d], part, log_every=1,
                         checkpoint_every=2)
    monkeypatch.setattr(d2v_models, "make_d2v_train_step", real_make)
    run_d2v_pretrain(cfg, pcfg, [d], part, log_every=1, checkpoint_every=0,
                     resume=True)
    h_full = json.load(open(os.path.join(full, "d2v_training_history.json")))
    h_part = json.load(open(os.path.join(part, "d2v_training_history.json")))
    assert [e["step"] for e in h_part] == [e["step"] for e in h_full]
    for a, b in zip(h_full, h_part):
        assert abs(a["loss"] - b["loss"]) < 1e-5, (a["step"], a, b)


def test_empty_epoch_raises(tmp_path):
    """1..batch_size-1 usable clips must raise, not busy-loop forever."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800))
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(crop_size=1500, min_sample_size=1000, batch_size=4,
                     max_steps=3, warmup_steps=1, clone_batch=2)
    with pytest.raises(ValueError, match="produced no batches"):
        run_d2v_pretrain(cfg, pcfg, [d], os.path.join(str(tmp_path), "o"))


def test_tiny_valid_split_raises(tmp_path):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000))
    with open(os.path.join(d, "valid.tsv"), "w") as f:
        print(open(os.path.join(d, "train.tsv")).read().splitlines()[0],
              file=f)
        print("clip0.wav\t2000", file=f)
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(crop_size=1500, min_sample_size=1000, batch_size=2,
                     max_steps=2, warmup_steps=1, clone_batch=2)
    with pytest.raises(ValueError, match="no validation batches"):
        run_d2v_pretrain(cfg, pcfg, [d], os.path.join(str(tmp_path), "o"),
                         valid_manifests=[d], valid_every=1)


def test_wav_crop_dataset_fractional_weights(tmp_path):
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        WavCropDataset,
    )

    d = _write_wav_corpus(tmp_path)
    pcfg = tiny_pcfg(crop_size=6000, min_sample_size=4500, batch_size=2)
    base = len(WavCropDataset([d], pcfg))  # 4 clips
    # fractional weight really down-samples: 0.5 -> half the corpus/epoch
    ds = WavCropDataset([d, d], pcfg, weights=[1.0, 0.5])
    assert len(ds.files_for_epoch(0)) == base + base // 2
    # the sampled subset changes per epoch but is deterministic per epoch
    e0 = ds.files_for_epoch(0)
    assert e0 == ds.files_for_epoch(0)
    picks = {tuple(sorted(p for p, _ in ds.files_for_epoch(e)[base:]))
             for e in range(8)}
    assert len(picks) > 1
    # non-positive weights are rejected, not silently rounded
    with pytest.raises(ValueError):
        WavCropDataset([d], pcfg, weights=[0.0])


@pytest.mark.slow
def test_run_d2v_pretrain_resume_continues_run(tmp_path, monkeypatch):
    """--resume continues the interrupted run: rng/epoch/history restored,
    so the resumed half reproduces the uninterrupted run exactly.

    The interruption must be a genuine crash mid-run (not a shorter
    max_steps: that would change the cosine-decay schedule and make the
    step-3 states legitimately differ)."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models import (
        d2v_pretrain as d2v_models,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000))
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(crop_size=1500, min_sample_size=1000, batch_size=2,
                     max_steps=6, warmup_steps=1, clone_batch=2)

    # uninterrupted 6-step run
    full = os.path.join(str(tmp_path), "full")
    run_d2v_pretrain(cfg, pcfg, [d], full, log_every=1, checkpoint_every=0)

    # same run crashing right after the step-3 checkpoint...
    real_make = d2v_models.make_d2v_train_step

    def crashing_make(model, tx):
        real_step = real_make(model, tx)
        calls = {"n": 0}

        def step(*a, **kw):
            calls["n"] += 1
            if calls["n"] > 3:
                raise RuntimeError("simulated crash")
            return real_step(*a, **kw)

        return step

    part = os.path.join(str(tmp_path), "part")
    monkeypatch.setattr(d2v_models, "make_d2v_train_step", crashing_make)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_d2v_pretrain(cfg, pcfg, [d], part, log_every=1,
                         checkpoint_every=3)
    monkeypatch.setattr(d2v_models, "make_d2v_train_step", real_make)

    # ...then resumed to completion
    run_d2v_pretrain(cfg, pcfg, [d], part, log_every=1, checkpoint_every=0,
                     resume=True)

    import json

    with open(os.path.join(full, "d2v_training_history.json")) as f:
        h_full = json.load(f)
    with open(os.path.join(part, "d2v_training_history.json")) as f:
        h_part = json.load(f)
    # history is COMPLETE (pre-resume entries kept) and step-aligned
    assert [h["step"] for h in h_part] == [h["step"] for h in h_full]
    for a, b in zip(h_full, h_part):
        assert abs(a["loss"] - b["loss"]) < 1e-5, (a["step"], a, b)


@pytest.mark.slow
def test_run_d2v_pretrain_dp_mesh_matches_single(tmp_path):
    """run_d2v_pretrain(mesh=dp8) reproduces the single-device run — the
    mesh-wired DRIVER capability (cli d2v-pretrain --dp)."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
        make_mesh,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000,
                                          2100, 2600, 2900, 3100))
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(crop_size=1500, min_sample_size=1000, batch_size=8,
                     max_steps=3, warmup_steps=1, clone_batch=2)
    last1 = run_d2v_pretrain(cfg, pcfg, [d],
                             os.path.join(str(tmp_path), "single"),
                             log_every=1, checkpoint_every=0)
    mesh = make_mesh(8, tp=1, axis_names=("dp",))
    with mesh:
        last8 = run_d2v_pretrain(cfg, pcfg, [d],
                                 os.path.join(str(tmp_path), "dp8"),
                                 log_every=1, checkpoint_every=0, mesh=mesh)
    assert abs(last1["loss"] - last8["loss"]) < 1e-4
    with pytest.raises(ValueError, match="divide"):
        bad = tiny_pcfg(crop_size=1500, min_sample_size=1000, batch_size=6,
                        max_steps=1, clone_batch=2)
        run_d2v_pretrain(cfg, bad, [d],
                         os.path.join(str(tmp_path), "bad"), mesh=mesh)


def test_d2v_optimizer_warmup_longer_than_run():
    # smoke runs pass --steps far below the default 8000-step warmup; the
    # schedule must clamp rather than crash on a negative decay span.
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.d2v_pretrain import (
        build_d2v_optimizer,
    )

    pcfg = tiny_pcfg(max_steps=4, warmup_steps=8000)
    tx = build_d2v_optimizer(pcfg)
    params = {"w": jnp.zeros((3,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((3,))}, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_span_mask_restricted_to_valid_frames():
    # fairseq's compute_mask_indices receives the padding mask; spans and
    # equalization fills must land on valid frames when lengths are passed
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.d2v_masking import (
        sample_span_mask,
    )

    B, T = 8, 100
    lengths = jnp.asarray([100, 80, 60, 40, 30, 25, 100, 50])
    mask, n_masked = sample_span_mask(
        jax.random.PRNGKey(0), B, T, 0.3, 5, lengths=lengths
    )
    assert mask.shape == (B, T)
    assert int(mask.sum(axis=1)[0]) == n_masked  # exact static count per row
    pos = np.arange(T)
    m = np.asarray(mask)
    for i, L in enumerate(np.asarray(lengths)):
        in_pad = m[i, pos >= L].sum()
        # rows with enough valid frames must not spend budget on padding
        if L >= n_masked:
            assert in_pad == 0, f"row {i}: {in_pad} masked frames in padding"
    # rows shorter than the budget overflow (static count preserved)
    short = int(np.argmin(np.asarray(lengths)))
    assert m[short].sum() == n_masked


@pytest.mark.slow
def test_bf16_state_storage_knobs(rng):
    """Round-4 bandwidth-floor experiment knobs (PERFORMANCE.md r4):
    ema_dtype / adam_mu_dtype quantize STORAGE only — EMA leaves and the
    AdamW first moment carry the requested dtype, the update math stays
    f32, training stays finite, and merge_teacher_params still hands the
    encoder its compute dtype."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.d2v_pretrain import (
        merge_teacher_params,
    )

    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(ema_dtype="bfloat16", adam_mu_dtype="bfloat16")
    model, tx, state = init_d2v_state(cfg, pcfg, jax.random.PRNGKey(0),
                                      example_len=64)
    for leaf in jax.tree.leaves(state.ema_blocks):
        assert leaf.dtype == jnp.bfloat16
    mu_leaves = jax.tree.leaves(state.opt_state[1][0].mu)
    assert all(l.dtype == jnp.bfloat16 for l in mu_leaves)

    step = make_d2v_train_step(model, tx)
    wav = rng.normal(size=(4, 64)).astype(np.float32)
    pad = np.zeros((4, 64), bool)
    for i in range(3):
        state, m = step(state, wav, pad, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree.leaves(state.ema_blocks):
        assert leaf.dtype == jnp.bfloat16  # storage dtype survives updates
    merged = merge_teacher_params(state.params, state.ema_blocks)
    for k in state.ema_blocks:
        for leaf in jax.tree.leaves(merged["params"][k]):
            assert leaf.dtype == jnp.dtype(cfg.dtype)


def test_remat_blocks_gradients_identical(rng):
    """remat_blocks=True (jax.checkpoint over the transformer blocks) is a
    pure execution-schedule change: same param tree, bit-identical loss and
    gradients for the same inputs/key."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.models.d2v_pretrain import (
        make_d2v_loss_fn,
    )

    cfg = EncoderConfig(**TINY_ENC)
    wav = rng.normal(size=(2, 64)).astype(np.float32)
    pad = np.zeros((2, 64), bool)
    pad[1, 48:] = True
    key = jax.random.PRNGKey(7)

    outs = {}
    for remat in (False, True):
        pcfg = tiny_pcfg(remat_blocks=remat)
        model, _tx, state = init_d2v_state(
            cfg, pcfg, jax.random.PRNGKey(0), example_len=64
        )
        loss_fn = make_d2v_loss_fn(model)
        (loss, _m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.ema_blocks, wav, pad, key
        )
        outs[remat] = (float(loss), grads)

    # same init => same param tree => identical loss and grads
    assert outs[False][0] == outs[True][0]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        outs[False][1], outs[True][1],
    )


# ---------------------------------------------------------------------------
# device-resident wav corpus (round 5): HBM-committed audio + on-device
# crop gathers replace the per-step wav upload
# ---------------------------------------------------------------------------
def test_index_crop_batches_matches_streaming(tmp_path):
    """The index projection (idx, starts) + host gather over load_all_audio's
    flat array reproduces WavCropDataset.batches BIT-IDENTICALLY — same
    epoch composition (incl. fractional multi-corpus weights), same shuffle,
    same crop rng draw sequence, same normalization and pad fill."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        WavCropDataset,
        index_crop_batches,
    )

    d = _write_wav_corpus(tmp_path)
    pcfg = tiny_pcfg(crop_size=6000, min_sample_size=4500, batch_size=2)
    # two corpora with a fractional weight: exercises indices_for_epoch's
    # repeat + seeded-pick composition
    ds = WavCropDataset([d, d], pcfg, weights=[1.0, 0.5])
    flat, sizes = ds.load_all_audio()
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    crop = pcfg.crop_size
    for epoch in (0, 1):
        streamed = list(ds.batches(epoch, 2))
        projected = list(index_crop_batches(ds, epoch, 2, sizes))
        assert len(streamed) == len(projected) > 0
        for (wav, pad), (idx, starts) in zip(streamed, projected):
            wav2 = np.zeros_like(wav)
            pad2 = np.ones_like(pad)
            for r in range(2):
                g, s = int(idx[r]), int(starts[r])
                n = min(int(sizes[g]) - s, crop)
                wav2[r, :n] = flat[offsets[g] + s : offsets[g] + s + n]
                pad2[r, :n] = False
            np.testing.assert_array_equal(wav, wav2)
            np.testing.assert_array_equal(pad, pad2)


def test_gather_clips_with_starts(rng):
    """gather_clips(starts=...) slices [start, start+crop) per row on
    device, pads short remainders with zeros/True-mask, and honors -1
    padded rows."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.resident import (
        gather_clips,
        resident_from_flat,
    )

    sizes = np.array([50, 30, 80], np.int64)
    flat = rng.normal(size=int(sizes.sum())).astype(np.float32)
    corpus = resident_from_flat(flat, sizes)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    crop = 40
    idx = np.array([0, 2, 1, -1], np.int32)
    starts = np.array([5, 40, 0, 0], np.int32)
    out, pad = jax.jit(
        lambda c, i, s: gather_clips(c, i, crop, starts=s)
    )(corpus, idx, starts)
    out, pad = np.asarray(out), np.asarray(pad)
    for r, (g, s) in enumerate(zip(idx, starts)):
        if g < 0:
            assert pad[r].all() and (out[r] == 0).all()
            continue
        n = min(int(sizes[g]) - int(s), crop)
        np.testing.assert_array_equal(
            out[r, :n], flat[offsets[g] + s : offsets[g] + s + n]
        )
        assert not pad[r, :n].any()
        assert pad[r, n:].all() and (out[r, n:] == 0).all()


@pytest.mark.slow
def test_run_d2v_pretrain_resident_matches_streaming(tmp_path):
    """resident=True produces the same per-step loss history as the
    streaming driver — the gathered (wav, pad) batches are bit-identical
    and the key stream is shared, so only XLA program structure differs."""
    import json

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000))
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(crop_size=1500, min_sample_size=1000, batch_size=2,
                     max_steps=6, warmup_steps=1, clone_batch=2)

    a = os.path.join(str(tmp_path), "streaming")
    b = os.path.join(str(tmp_path), "resident")
    run_d2v_pretrain(cfg, pcfg, [d], a, log_every=1, checkpoint_every=0)
    run_d2v_pretrain(cfg, pcfg, [d], b, log_every=1, checkpoint_every=0,
                     resident=True)
    h_a = json.load(open(os.path.join(a, "d2v_training_history.json")))
    h_b = json.load(open(os.path.join(b, "d2v_training_history.json")))
    assert [e["step"] for e in h_b] == [e["step"] for e in h_a] == list(
        range(1, 7)
    )
    for ea, eb in zip(h_a, h_b):
        for key in ("loss", "d2v_loss", "cls_loss", "target_var", "pred_var"):
            assert abs(ea[key] - eb[key]) < 1e-5, (ea["step"], key, ea, eb)


@pytest.mark.slow
def test_run_d2v_pretrain_resident_resume(tmp_path, monkeypatch):
    """A resident run crash-interrupted mid-epoch resumes to the same
    final history as an uninterrupted resident run (index projection
    honors the batch_in_epoch skip; rng stream restored). The crash is a
    genuine mid-run exception, NOT a shorter max_steps (that would change
    the cosine-decay schedule — see test_run_d2v_pretrain_resume_continues_run)."""
    import json

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel import (
        resident as resident_mod,
    )
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        run_d2v_pretrain,
    )

    d = _write_wav_corpus(tmp_path, lens=(2000, 2400, 2800, 3000))
    cfg = EncoderConfig(**TINY_ENC)
    pcfg = tiny_pcfg(crop_size=1500, min_sample_size=1000, batch_size=2,
                     max_steps=5, warmup_steps=1, clone_batch=2)

    full = os.path.join(str(tmp_path), "full")
    run_d2v_pretrain(cfg, pcfg, [d], full, log_every=1,
                     checkpoint_every=0, resident=True)

    # same run crashing right after the step-3 checkpoint (mid-epoch:
    # 2 steps/epoch, so step 3 is epoch 1 batch 0)...
    real_make = resident_mod.make_resident_d2v_step

    def crashing_make(model, tx):
        real_step = real_make(model, tx)
        calls = {"n": 0}

        def step(*a, **kw):
            calls["n"] += 1
            if calls["n"] > 3:
                raise RuntimeError("simulated crash")
            return real_step(*a, **kw)

        return step

    part = os.path.join(str(tmp_path), "part")
    monkeypatch.setattr(resident_mod, "make_resident_d2v_step", crashing_make)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_d2v_pretrain(cfg, pcfg, [d], part, log_every=1,
                         checkpoint_every=3, resident=True)
    monkeypatch.setattr(resident_mod, "make_resident_d2v_step", real_make)

    # ...then resumed to completion
    run_d2v_pretrain(cfg, pcfg, [d], part, log_every=1, checkpoint_every=0,
                     resident=True, resume=True)
    h_full = json.load(open(os.path.join(full, "d2v_training_history.json")))
    h_part = json.load(open(os.path.join(part, "d2v_training_history.json")))
    assert [e["step"] for e in h_part] == [e["step"] for e in h_full]
    for ea, eb in zip(h_full, h_part):
        for key in ("loss", "d2v_loss", "cls_loss"):
            assert abs(ea[key] - eb[key]) < 1e-5, (ea["step"], key)


def test_crop_align_quantizes_both_paths(tmp_path):
    """Round 5: crop starts floor to the crop_align grid in BOTH the
    streaming loop and the index projection (same rng consumption), so
    resident stays bit-identical to streaming; crop_align=1 restores
    fairseq's sample-level distribution."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.d2v_pretrain import (
        WavCropDataset, index_crop_batches,
    )

    d = _write_wav_corpus(tmp_path)
    pcfg = tiny_pcfg(crop_size=4096, min_sample_size=4000, batch_size=2)
    assert pcfg.crop_align == 128  # product default
    ds = WavCropDataset([d], pcfg)
    _flat, sizes = ds.load_all_audio()
    starts_all = np.concatenate(
        [s for _i, s in index_crop_batches(ds, 0, 2, sizes)]
    )
    assert (starts_all % 128 == 0).all()
    # unquantized config draws off-grid starts on the same corpus
    pcfg1 = tiny_pcfg(crop_size=4096, min_sample_size=4000, batch_size=2,
                      crop_align=1)
    ds1 = WavCropDataset([d], pcfg1)
    starts_raw = np.concatenate(
        [s for _i, s in index_crop_batches(ds1, 0, 2, sizes)]
    )
    assert (starts_raw % 128 != 0).any()
    # floor relation: quantized = raw - raw % 128 (same draws)
    np.testing.assert_array_equal(starts_all, starts_raw - starts_raw % 128)
    # streaming loop agrees with the projection (bit-identity contract)
    (wav, pad) = next(iter(ds.batches(0, 2)))
    idx, starts = next(index_crop_batches(ds, 0, 2, sizes))
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    for r in range(2):
        g, s = int(idx[r]), int(starts[r])
        n = min(int(sizes[g]) - s, pcfg.crop_size)
        np.testing.assert_array_equal(
            wav[r, :n], _flat[offsets[g] + s : offsets[g] + s + n]
        )


def test_gather_clips_starts_aligned_block_path(rng):
    """starts_aligned=True (quantized crop offsets) must equal the element
    path exactly — including short-remainder rows and -1 rows."""
    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.parallel.resident import (
        gather_clips, resident_from_flat,
    )

    sizes = np.array([1000, 300, 777, 512], np.int64)
    flat = rng.normal(size=int(sizes.sum())).astype(np.float32)
    corpus = resident_from_flat(flat, sizes)
    crop = 512  # multiple of 128 -> block path eligible
    idx = np.array([0, 2, 3, -1, 1], np.int32)
    starts = np.array([384, 128, 0, 0, 0], np.int32)
    elem = jax.jit(lambda c, i, s: gather_clips(c, i, crop, starts=s))
    blk = jax.jit(
        lambda c, i, s: gather_clips(c, i, crop, starts=s,
                                     starts_aligned=True)
    )
    oe, pe = elem(corpus, idx, starts)
    ob, pb = blk(corpus, idx, starts)
    np.testing.assert_array_equal(np.asarray(oe), np.asarray(ob))
    np.testing.assert_array_equal(np.asarray(pe), np.asarray(pb))
