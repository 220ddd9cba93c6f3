"""Fused extract+train: waveform -> emotion2vec encoder -> DAD step, one XLA
program over a (dp, tp) mesh.

The reference runs feature extraction as an offline per-clip pass
(emotion2vec_speech_features.py) and training as a separate stage; on TPU we
fuse them: the clean/noisy waveform batches go through the (frozen,
tp-sharded) transformer and straight into the teacher-student DAD losses
without touching the host. This is the north-star benchmark path
(BASELINE.json: "clips/sec/chip for the fused extract+train step").

Noise can be injected on-device too (audio.batch_mix_noise_bank), making the
whole reference preprocessing pipeline a single jitted function.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import DADConfig, EncoderConfig
from ..dad.augment import strong_augment, weak_augment
from ..dad.dacp import dacp_mask, fixed_threshold_mask
from ..dad.ecda import ecda_loss
from ..dad.train_step import DADTrainState, StepScalars, smoothed_ce
from ..models.emotion2vec import Emotion2vecEncoder, normalize_wav
from ..models.heads import DADHead, SSRLState, ema_update
from .mesh import batch_sharding, encoder_param_sharding, replicated


@dataclass(frozen=True)
class FusedConfig:
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    dad: DADConfig = field(default_factory=DADConfig)
    # white-noise SNR injected on-device into the "noisy" stream (optional)
    inject_snr_db: Optional[float] = None
    # multi-SNR branch: sample one of these SNRs per clip per step (takes
    # precedence over inject_snr_db) — the on-device analogue of the
    # reference's multi-SNR noisy trees
    inject_snr_choices: Optional[Tuple[float, ...]] = None
    # real-noise (NOISEX-92) injection from a device-resident (K, Tn) bank
    # instead of white noise: "fixed" = one type for every clip
    # (inject_noise_type; the reference's root1 trees), "random" = a random
    # type per clip (root2, add_real_noise_to_audio.py noise_mode 'random').
    # When set, the step takes the bank tensor as an extra trailing argument
    # (load_noise_bank builds it from the NOISEX 5types dir) and the SNR
    # still comes from inject_snr_db / inject_snr_choices.
    inject_noise_bank_mode: Optional[str] = None  # None | "fixed" | "random"
    inject_noise_type: int = 0
    # the clean stream has no wav-level randomness, so its features are
    # static across steps; with this on, the step takes a CleanFeatureBatch
    # (precomputed once, e.g. via precompute_clean_features) and only the
    # noisy stream — which earns re-extraction via fresh per-step noise
    # injection — runs the encoder. Halves encoder FLOPs with identical
    # training semantics.
    cache_clean_features: bool = False


class FusedBatch(NamedTuple):
    wav: jax.Array  # (B, T) waveforms
    wav_mask: jax.Array  # (B, T) bool True=pad
    labels: jax.Array  # (B,)
    row_valid: jax.Array  # (B,)
    # clip indices for per-sample confirmation-bias tracking (train.py:424-
    # 437); None skips the tracking outputs (bench / dryrun paths)
    ids: Optional[jax.Array] = None  # (B,) int32


class CleanFeatureBatch(NamedTuple):
    feats: jax.Array  # (B, T', D) f32 encoder features
    frame_mask: jax.Array  # (B, T') bool True=pad
    labels: jax.Array  # (B,)
    row_valid: jax.Array  # (B,)


def precompute_clean_features(
    encoder: Emotion2vecEncoder, enc_params, cfg: FusedConfig, clean: FusedBatch
) -> CleanFeatureBatch:
    """One extraction pass turning a clean wav batch into the static feature
    batch consumed by the cache_clean_features step."""
    wav = (
        normalize_wav(clean.wav, clean.wav_mask)
        if cfg.encoder.normalize_input
        else clean.wav
    )
    feats, frame_mask = encoder.apply(enc_params, wav, clean.wav_mask)
    return CleanFeatureBatch(
        feats=feats.astype(jnp.float32),
        frame_mask=frame_mask,
        labels=clean.labels,
        row_valid=clean.row_valid,
    )


def init_fused(cfg: FusedConfig, key: jax.Array, example_len: int = 16000):
    """Initializes encoder + DAD head params and optimizer."""
    from ..dad.train_step import build_optimizer, init_dad_train_state

    k_enc, k_head = jax.random.split(key)
    encoder = Emotion2vecEncoder(cfg.encoder)
    enc_params = encoder.init(k_enc, jnp.zeros((1, example_len), jnp.float32))
    head, tx, state = init_dad_train_state(cfg.dad, k_head)
    return encoder, enc_params, head, tx, state


def validate_injection(cfg: FusedConfig) -> None:
    if cfg.inject_noise_bank_mode not in (None, "fixed", "random"):
        raise ValueError(
            f"bad inject_noise_bank_mode {cfg.inject_noise_bank_mode!r}"
        )
    if cfg.inject_noise_bank_mode is not None and not (
        cfg.inject_snr_choices or cfg.inject_snr_db is not None
    ):
        raise ValueError(
            "inject_noise_bank_mode needs inject_snr_db or inject_snr_choices"
        )


def inject_noise(cfg: FusedConfig, noisy_wav, wav_mask, key, noise_bank=None):
    """On-device analogue of the reference injectors: white noise
    (add_noise_to_audio.py) or NOISEX bank mixing
    (add_real_noise_to_audio.py:129-160), at a fixed or per-clip SNR.
    Traceable; called from inside the fused step's loss."""
    if cfg.inject_snr_choices:
        k_pick, key = jax.random.split(key)
        snrs = jnp.asarray(cfg.inject_snr_choices, jnp.float32)
        snr = snrs[
            jax.random.randint(k_pick, (noisy_wav.shape[0],), 0, len(snrs))
        ]
    elif cfg.inject_snr_db is not None:
        snr = cfg.inject_snr_db
    else:
        return noisy_wav
    if cfg.inject_noise_bank_mode is not None:
        from ..audio.noise import batch_mix_noise_bank

        return batch_mix_noise_bank(
            noisy_wav, ~wav_mask, noise_bank, snr, key,
            noise_type=cfg.inject_noise_type,
            per_sample_type=cfg.inject_noise_bank_mode == "random",
        )
    from ..audio.noise import batch_add_white_noise

    return batch_add_white_noise(noisy_wav, ~wav_mask, snr, key)


def build_fused_step(
    encoder: Emotion2vecEncoder,
    head: DADHead,
    tx,
    cfg: FusedConfig,
):
    """The UNJITTED fused step: step(enc_params, state, clean, noisy,
    scalars, anchors, key[, noise_bank]) -> (state', metrics).

    ``make_fused_extract_train_step`` jits it directly (host-streamed
    batches); ``resident.make_resident_fused_step`` prepends on-device
    batch gathers from an HBM-resident corpus and jits the composition —
    both run the SAME loss/update graph.
    """
    dad = cfg.dad
    smoothing = dad.label_smoothing_factor if dad.use_label_smoothing else 0.0

    def extract(enc_params, wav, wav_mask):
        wav = normalize_wav(wav, wav_mask) if cfg.encoder.normalize_input else wav
        feats, frame_mask = encoder.apply(enc_params, wav, wav_mask)
        return jax.lax.stop_gradient(feats.astype(jnp.float32)), frame_mask

    validate_injection(cfg)

    def inject(noisy_wav, wav_mask, key, noise_bank):
        return inject_noise(cfg, noisy_wav, wav_mask, key, noise_bank)

    def loss_fn(student, teacher, dacp_state, enc_params, clean: FusedBatch,
                noisy: FusedBatch, scalars: StepScalars, anchors, key,
                noise_bank=None):
        k_inj, k_dc, k_w, k_s, k_ds = jax.random.split(key, 5)

        noisy_wav = inject(noisy.wav, noisy.wav_mask, k_inj, noise_bank)

        # NB: merging the two extracts into one concat-batch pass was measured
        # SLOWER (70 vs 61 ms/step device time) — the 2x-batch conv
        # activations change XLA's conv emitter/VMEM scoping for the worse.
        if cfg.cache_clean_features:
            clean_feats = jax.lax.stop_gradient(clean.feats)
            clean_fmask = clean.frame_mask
        else:
            clean_feats, clean_fmask = extract(enc_params, clean.wav, clean.wav_mask)
        noisy_feats, noisy_fmask = extract(enc_params, noisy_wav, noisy.wav_mask)

        clean_logits, clean_emb = head.apply(
            student, clean_feats, clean_fmask, deterministic=False,
            rngs={"dropout": k_dc},
        )
        ce = smoothed_ce(clean_logits, clean.labels, clean.row_valid, smoothing)

        weak = weak_augment(k_w, noisy_feats, dad.augment)
        strong = strong_augment(
            k_s, noisy_feats, dad.augment, padding_mask=noisy_fmask
        )
        teacher_logits, _ = head.apply(
            jax.lax.stop_gradient(teacher), weak, noisy_fmask, deterministic=True
        )
        teacher_probs = jax.nn.softmax(teacher_logits, axis=-1)

        if dad.dacp.use_dacp:
            new_dacp, mask, scores, wce = dacp_mask(
                dacp_state, teacher_probs, noisy.row_valid, scalars.gamma_e,
                anchors, dad.dacp,
            )
        else:
            mask, scores, wce = fixed_threshold_mask(
                teacher_probs, noisy.row_valid, dad.dacp.fixed_confidence_threshold
            )
            new_dacp = dacp_state

        student_logits, strong_emb = head.apply(
            student, strong, noisy_fmask, deterministic=False,
            rngs={"dropout": k_ds},
        )
        student_logp = jax.nn.log_softmax(student_logits, axis=-1)
        mask_f = mask.astype(jnp.float32)
        count = jnp.sum(mask_f)
        kl = jnp.sum(
            teacher_probs * (jnp.log(teacher_probs + 1e-12) - student_logp), axis=-1
        )
        consistency = jnp.where(count > 1, jnp.sum(kl * mask_f) / (count + 1e-8), 0.0)

        preds = jnp.argmax(teacher_probs, axis=-1)
        if dad.ecda.use_ecda:
            ecda = ecda_loss(
                clean_emb, strong_emb, clean.labels, preds, mask, scores, wce,
                clean.row_valid, noisy.row_valid, dad.ecda,
            )
            ecda = jnp.where((count > 1) & (scalars.w_ecda > 0), ecda, 0.0)
        else:
            ecda = jnp.asarray(0.0, jnp.float32)

        consistency = jnp.where(scalars.warmup, 0.0, consistency)
        ecda = jnp.where(scalars.warmup, 0.0, ecda)
        new_dacp = jax.tree.map(
            lambda new, old: jnp.where(scalars.warmup, old, new), new_dacp, dacp_state
        )
        total = ce + scalars.w_consistency * consistency + scalars.w_ecda * ecda
        metrics = {
            "total_loss": total,
            "supervised_ce_loss": ce,
            "consistency_loss": consistency,
            "ecda_loss": ecda,
            "high_confidence_count": count,
        }
        if noisy.ids is not None:
            # same per-sample tracking contract as the feature-level step
            # (dad/train_step.py aux["tracking"], reference train.py:424-437)
            metrics["tracking"] = {
                "ids": noisy.ids,
                "pseudo_label": preds,
                "certainty_score": scores,
                "is_masked_in": mask,
            }
        return total, (new_dacp, metrics)

    def step(enc_params, state: DADTrainState, clean: FusedBatch,
             noisy: FusedBatch, scalars: StepScalars, anchors, key,
             noise_bank=None):
        grads, (new_dacp, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.ssrl.student, state.ssrl.teacher, state.dacp, enc_params,
            clean, noisy, scalars, anchors, key, noise_bank,
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.ssrl.student)
        new_student = optax.apply_updates(state.ssrl.student, updates)
        ssrl = SSRLState(student=new_student, teacher=state.ssrl.teacher)
        ssrl_ema = ema_update(ssrl, cfg.dad.ema_momentum)
        new_teacher = jax.tree.map(
            lambda cold, hot: jnp.where(scalars.warmup, cold, hot),
            ssrl.teacher, ssrl_ema.teacher,
        )
        return (
            DADTrainState(
                ssrl=SSRLState(new_student, new_teacher),
                opt_state=new_opt,
                dacp=new_dacp,
            ),
            metrics,
        )

    return step


def make_fused_extract_train_step(
    encoder: Emotion2vecEncoder,
    head: DADHead,
    tx,
    cfg: FusedConfig,
    mesh: Optional[Mesh] = None,
):
    """Returns jitted step(enc_params, state, clean: FusedBatch,
    noisy: FusedBatch, scalars, anchors, key) -> (state', metrics).

    The encoder is frozen (features are precomputed in the reference
    pipeline); only head params get gradients. With a mesh, encoder params are
    tp-sharded and batches dp-sharded.
    """
    step = build_fused_step(encoder, head, tx, cfg)

    if mesh is None:
        return jax.jit(step, donate_argnums=(1,))

    rep = replicated(mesh)
    dp1 = batch_sharding(mesh, 1)
    dp2 = batch_sharding(mesh, 2)
    dp3 = batch_sharding(mesh, 3)
    if cfg.cache_clean_features:
        clean_spec = CleanFeatureBatch(
            feats=dp3, frame_mask=dp2, labels=dp1, row_valid=dp1
        )
    else:
        clean_spec = FusedBatch(wav=dp2, wav_mask=dp2, labels=dp1,
                                row_valid=dp1, ids=dp1)
    # ids=dp1 is a no-op when the batch carries ids=None (empty subtree)
    noisy_spec = FusedBatch(wav=dp2, wav_mask=dp2, labels=dp1, row_valid=dp1,
                            ids=dp1)

    in_shardings = [
        None,  # enc_params: placed by the caller (tp-sharded)
        None,  # state: replicated placement by caller
        clean_spec,
        noisy_spec,
        rep,
        rep,
        rep,
    ]
    if cfg.inject_noise_bank_mode is not None:
        in_shardings.append(rep)  # noise bank: small, replicated
    return jax.jit(
        step,
        donate_argnums=(1,),
        in_shardings=tuple(in_shardings),
        out_shardings=None,
    )


def place_fused(enc_params, state: DADTrainState, mesh: Mesh):
    """Device placement: encoder tp-sharded, DAD state replicated."""
    enc_sharded = jax.device_put(enc_params, encoder_param_sharding(mesh, enc_params))
    rep = replicated(mesh)
    state_rep = jax.tree.map(lambda x: jax.device_put(x, rep), state)
    return enc_sharded, state_rep
