"""TPU-native Dynamic Asymmetric Distillation framework for noise-robust
speech emotion recognition.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the PyTorch
reference repo ``TMZZ22331/Robust-Speech-Emotion-Recognition-via-Dynamic-
Asymmetric-Distillation-in-Noisy-Environments`` (mounted read-only at
``/root/reference``; see SURVEY.md for the full structural analysis).

Layout
------
- ``configs``  typed config tree + per-corpus presets (replaces the reference's
  three near-duplicate module-constant config files).
- ``data``     feature store (``train.npy``/``.lengths``/``.emo``/``.lbl``/
  ``.spk`` on-disk compatible), corpus adapters + manifests, fold policies,
  static-shape bucketing/batching.
- ``audio``    SNR-matched white / NOISEX-92 noise injection (jittable + CLI),
  SNR verification, format checking.
- ``models``   emotion2vec (data2vec-multi) encoder in flax, linear heads,
  teacher-student SSRL model, torch<->flax checkpoint converters.
- ``ops``      Pallas/XLA kernels: flash attention, masked pooling/quantile,
  pairwise-distance multi-kernel MMD.
- ``dad``      the DAD algorithm core: weak/strong augmentation, DACP
  (dynamic adaptive confidence pruning), ECDA (class-aware MMD alignment),
  EMA teacher, anchor calibration, fully-jitted train step.
- ``train``    supervised pretrain driver and cross-domain DAD trainer.
- ``eval``     sklearn-parity metrics, report writers, cross-corpus inference.
- ``exp``      ablation / hyperparameter-sensitivity experiment harness.
- ``analysis`` training-dynamics analysis (disagreement, confirmation bias,
  DACP evolution, t-SNE, distribution).
- ``parallel`` device mesh / sharding utilities and pjit-sharded train steps.

Import tip: the canonical package name mirrors the reference repo name; alias
it on import::

    import robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu as dad_tpu
"""

__version__ = "0.1.0"

SHORT_NAME = "dad_tpu"
