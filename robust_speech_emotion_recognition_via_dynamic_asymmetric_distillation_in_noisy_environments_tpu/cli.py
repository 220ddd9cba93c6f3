"""Unified CLI: one binary for the whole pipeline.

Replaces the reference's PowerShell drivers + per-stage scripts:

    python -m <pkg> manifest   --corpus iemocap --root ... --dest ...
    python -m <pkg> inject     --input_root ... --output_root ... --snr_db 10 ...
    python -m <pkg> extract    --data ... --checkpoint ... --save-dir ...
    python -m <pkg> pretrain   --corpus emodb --feat-path ... --save-dir ...
    python -m <pkg> dad        --corpus iemocap --clean ... --noisy ... --weights ...
    python -m <pkg> infer      --weights ... --test-data ...
    python -m <pkg> ablation   --corpus iemocap --suite standard ...
    python -m <pkg> analyze    --kind disagreement --results-dir ...
"""

from __future__ import annotations

import argparse
import os
import sys


def _load_encoder_json(arg: str) -> dict:
    """--encoder-json accepts an inline JSON object OR a path to a JSON
    file (all commands, uniformly). conv_feature_layers lists become
    tuples so the frozen EncoderConfig stays hashable for jit."""
    import json

    if arg.lstrip().startswith("{"):
        kw = json.loads(arg)
    else:
        with open(arg, encoding="utf-8") as f:
            kw = json.load(f)
    if "conv_feature_layers" in kw:
        kw["conv_feature_layers"] = tuple(
            tuple(x) for x in kw["conv_feature_layers"]
        )
    return kw


def _cmd_manifest(args):
    from .data import manifests

    if args.corpus == "iemocap":
        if args.eval_dir:
            labels = manifests.parse_iemocap_emo_evaluation(args.eval_dir)
            manifests.build_iemocap_manifest(args.root, args.dest, labels=labels)
        else:
            manifests.build_iemocap_manifest(args.root, args.dest, label_path=args.label_path)
    elif args.corpus == "casia":
        manifests.build_casia_manifest(args.root, args.dest)
    elif args.corpus == "emodb":
        manifests.build_emodb_manifest(args.root, args.dest)
    return 0


def _cmd_inject(args):
    from .audio.cli import main as inject_main

    argv = ["inject", "--input_root", args.input_root, "--output_root",
            args.output_root, "--snr_db", str(args.snr_db),
            "--manifest_path", args.manifest_path, "--seed", str(args.seed),
            "--engine", args.engine, "--threads", str(args.threads)]
    if args.noise_root:
        argv += ["--noise_root", args.noise_root, "--noise_mode", args.noise_mode,
                 "--noise_type", args.noise_type]
    if args.verify:
        argv += ["--verify"]
    return inject_main(argv)


def _cmd_extract(args):
    from .models.extract import main as extract_main

    argv = ["--data", args.data, "--split", args.split, "--checkpoint",
            args.checkpoint, "--save-dir", args.save_dir, "--layer",
            str(args.layer), "--batch-size", str(args.batch_size),
            "--dp", str(args.dp), "--tp", str(args.tp)]
    if args.encoder_json:
        argv += ["--encoder-json", args.encoder_json]
    return extract_main(argv)


def _cmd_pretrain(args):
    from .configs import pretrain_preset
    from .train import train_with_early_stopping

    cfg = pretrain_preset(
        args.corpus,
        variant=args.variant,
        feat_path=args.feat_path,
        save_dir=args.save_dir,
        max_epochs=args.max_epochs,
    )
    folds = tuple(int(f) for f in args.folds.split(",")) if args.folds else None
    train_with_early_stopping(cfg, folds=folds)
    return 0


def _cmd_d2v_pretrain(args):
    from .configs import D2vPretrainConfig, EncoderConfig
    from .train.d2v_pretrain import run_d2v_pretrain

    enc_kw = {}
    if args.fast:
        # the measured-best v5e configuration (PERFORMANCE.md round-3
        # roofline: +51% over defaults); explicit json/flags still win
        enc_kw.update(
            dtype="bfloat16", fast_ln=True, fast_softmax=True,
            gelu_approximate=True,
        )
        if args.prng == "threefry":
            args.prng = "rbg"
    if args.encoder_json:
        enc_kw.update(_load_encoder_json(args.encoder_json))
    cfg = EncoderConfig(**enc_kw)
    pcfg = D2vPretrainConfig(
        batch_size=args.batch_size,
        max_steps=args.steps,
        warmup_steps=args.warmup_steps,
        learning_rate=args.lr,
        crop_size=args.crop_size,
        min_sample_size=args.min_sample_size,
        mask_prob=args.mask_prob,
        mask_length=args.mask_length,
        clone_batch=args.clone_batch,
        cls_loss=args.cls_loss,
        rng_impl=args.prng,
        ema_dtype=args.ema_dtype,
        adam_mu_dtype=args.adam_mu_dtype,
        remat_blocks=args.remat,
    )
    weights = (
        [float(w) for w in args.weights.split(",")] if args.weights else None
    )
    mesh = None
    if args.dp > 0 or args.tp > 1:
        from .parallel import make_mesh

        mesh = make_mesh((args.dp or 1) * args.tp, tp=args.tp)
    run_d2v_pretrain(
        cfg, pcfg, args.manifests, args.save_dir,
        weights=weights, init_checkpoint=args.init_checkpoint,
        resume=args.resume, mesh=mesh, binarized=args.binarized,
        transfer_dtype=args.transfer_dtype, scan_chunk=args.scan_chunk,
        valid_manifests=args.valid_manifests, valid_split=args.valid_split,
        valid_every=args.valid_every,
        resident={"auto": "auto", "on": True, "off": False}[args.resident],
        resident_max_bytes=args.resident_max_bytes,
    )
    return 0


def _cmd_d2v_pack(args):
    from .data.binarized import pack_manifest

    if len(args.manifests) != len(args.out_dirs):
        raise ValueError(
            f"--manifests ({len(args.manifests)}) and --out-dirs "
            f"({len(args.out_dirs)}) must pair up"
        )
    for mdir, out in zip(args.manifests, args.out_dirs):
        n, total = pack_manifest(
            mdir, out, split=args.split, sample_rate=args.sample_rate
        )
        print(f"{mdir} -> {out}: {n} clips, {total} samples")
    return 0


def _resolve_scan_chunk(arg, fused: bool, mesh_active: bool,
                        resident_off: bool = False) -> int:
    """Resolve `dad --scan-chunk` (None = unset). Defaults: per-step (0)
    everywhere EXCEPT the explicitly host-streaming feature path
    (`--resident off`), where 4 amortizes the per-step feature uploads
    (measured best at IEMOCAP scale, round 1). On the device-resident
    feature path there are no uploads to amortize and per-step dispatch
    measured 11.4 ms/batch vs 28.5-51.9 for chunked scans at IEMOCAP
    scale (tools/bench_input_pipeline.py --resident, round 5 — closing
    the round-4 advisor note that this default was inherited
    unmeasured); fused --from-wav mode was already per-step
    (PERFORMANCE.md round 4). Always per-batch under a mesh — the
    sharded steps run one batch per dispatch."""
    if mesh_active:
        return 0
    if arg is None:
        return 4 if (not fused and resident_off) else 0
    return arg


def _cmd_dad(args):
    from .configs import dad_preset

    if args.from_wav:
        return _cmd_dad_fused(args)
    from .train import CrossDomainTrainer, run_cv

    if not (args.clean and args.noisy):
        raise ValueError("--clean and --noisy are required "
                         "(or use --from-wav for fused training)")
    kw = dict(
        clean_data_dir=args.clean,
        noisy_data_dir=args.noisy,
        pretrained_weight=args.weights or "",
        epochs=args.epochs,
    )
    if args.warmup_epochs is not None:
        kw["warmup_epochs"] = args.warmup_epochs
        kw["ecda_start_epoch"] = args.warmup_epochs
    if args.batch_size is not None:
        kw["batch_size"] = args.batch_size
    if args.bucket_batches:
        kw["bucket_batches"] = True
    cfg = dad_preset(args.corpus, **kw)
    mesh = None
    if args.dp > 0:
        from .parallel import make_mesh

        mesh = make_mesh(args.dp, tp=1, axis_names=("dp",))
    scan_chunk = _resolve_scan_chunk(args.scan_chunk, fused=False,
                                     mesh_active=mesh is not None,
                                     resident_off=args.resident == "off")
    # "auto" engages the device-resident corpus unless a mesh is given
    # (the dp-sharded feature step streams; see CrossDomainTrainer)
    resident = {"auto": "auto", "on": True, "off": False}[args.resident]
    if args.fold == "all":
        run_cv(cfg, experiment_name=args.name, scan_chunk=scan_chunk,
               prefetch_depth=args.prefetch_depth,
               transfer_dtype=args.transfer_dtype, mesh=mesh,
               resident=resident)
    else:
        trainer = CrossDomainTrainer(
            cfg, fold=int(args.fold), experiment_name=args.name,
            scan_chunk=scan_chunk,
            prefetch_depth=args.prefetch_depth,
            transfer_dtype=args.transfer_dtype,
            mesh=mesh,
            resident=resident,
        )
        trainer.train(resume=args.resume)
    return 0


def _build_fused_from_args(args, cfg):
    """Shared --from-wav setup: encoder config + checkpoint + FusedConfig
    from the common injection flags (used by `dad --from-wav` and
    `ablation --from-wav`)."""
    from .configs import EncoderConfig
    from .models.convert import load_emotion2vec_checkpoint
    from .parallel.fused import FusedConfig

    if not args.checkpoint:
        raise ValueError("--from-wav needs --checkpoint (emotion2vec weights)")
    enc_kw = {"dtype": args.encoder_dtype}
    if args.encoder_json:
        enc_kw.update(_load_encoder_json(args.encoder_json))
    enc_cfg = EncoderConfig(**enc_kw)
    enc_params = load_emotion2vec_checkpoint(args.checkpoint, enc_cfg)

    snr_choices = (
        tuple(float(s) for s in args.snr_choices.split(","))
        if args.snr_choices
        else None
    )
    bank_mode = None
    type_idx = 0
    if args.noise_root:
        from .audio.noise import NOISE_TYPES

        bank_mode = "random" if args.noise_mode == "random" else "fixed"
        if args.noise_type not in NOISE_TYPES:
            raise ValueError(f"unknown noise type {args.noise_type!r}; "
                             f"expected one of {NOISE_TYPES}")
        type_idx = NOISE_TYPES.index(args.noise_type)
    fused_cfg = FusedConfig(
        encoder=enc_cfg,
        dad=cfg,
        inject_snr_db=None if snr_choices else args.snr,
        inject_snr_choices=snr_choices,
        inject_noise_bank_mode=bank_mode,
        inject_noise_type=type_idx,
        cache_clean_features=True,
    )
    return enc_cfg, enc_params, fused_cfg


def _cmd_dad_fused(args):
    """Fused wav->train mode: one XLA program per step does injection +
    extraction + the DAD update (train/fused_trainer.py)."""
    from .configs import dad_preset
    from .train.fused_trainer import FusedCrossDomainTrainer, run_fused_cv

    cfg = dad_preset(args.corpus, **_sweep_cfg_kw(args))

    enc_cfg, enc_params, fused_cfg = _build_fused_from_args(args, cfg)

    mesh = None
    if args.dp > 0 or args.tp > 1:
        from .parallel import make_mesh

        mesh = make_mesh((args.dp or 1) * args.tp, tp=args.tp)

    common = dict(
        fused_cfg=fused_cfg,
        noise_root=args.noise_root,
        experiment_name=args.name,
        prefetch_depth=args.prefetch_depth,
        mesh=mesh,
        transfer_dtype=args.transfer_dtype,
        resident={"auto": "auto", "on": True, "off": False}[args.resident],
        scan_chunk=_resolve_scan_chunk(args.scan_chunk, fused=True,
                                       mesh_active=mesh is not None),
    )
    if args.fold == "all":
        run_fused_cv(cfg, args.from_wav, enc_cfg, enc_params, **common)
    else:
        trainer = FusedCrossDomainTrainer(
            cfg, args.from_wav, enc_cfg, enc_params, fold=int(args.fold),
            **common,
        )
        trainer.train(resume=args.resume)
    return 0


def _cmd_infer(args):
    from .eval.inference import CrossDomainInference

    inf = CrossDomainInference(
        args.weights, args.test_data, args.output_dir, fold=args.fold,
        use_teacher=args.teacher,
    )
    inf.run_inference(args.split)
    return 0


def _cmd_serve(args):
    from .configs import dad_preset
    from .eval.serving import EmotionPredictor, PredictionServer
    from .models.convert import load_torch_file, torch_state_dict_to_ssrl

    cfg = dad_preset(args.corpus)
    ssrl = torch_state_dict_to_ssrl(load_torch_file(args.weights))
    extractor = None
    if args.checkpoint:
        from .configs import EncoderConfig
        from .models.convert import load_emotion2vec_checkpoint
        from .models.extract import FeatureExtractor

        enc_cfg = EncoderConfig(dtype=args.encoder_dtype)
        params = load_emotion2vec_checkpoint(args.checkpoint, enc_cfg)
        extractor = FeatureExtractor(enc_cfg, params, batch_size=args.max_batch)
    predictor = EmotionPredictor(
        cfg, ssrl, extractor=extractor, batch_size=args.max_batch,
        use_teacher=args.teacher, wav_transfer_dtype=args.wav_dtype,
    )
    if not args.no_warmup:
        predictor.warmup()
    server = PredictionServer(
        predictor, host=args.host, port=args.port,
        max_wait_ms=args.max_wait_ms,
    )
    server.serve_forever()
    return 0


def _sweep_cfg_kw(args):
    """DAD-config keyword overrides shared by the fused dad, ablation and
    sensitivity commands."""
    kw = dict(pretrained_weight=args.weights or "", epochs=args.epochs)
    if getattr(args, "warmup_epochs", None) is not None:
        kw["warmup_epochs"] = args.warmup_epochs
        kw["ecda_start_epoch"] = args.warmup_epochs
    if getattr(args, "batch_size", None) is not None:
        kw["batch_size"] = args.batch_size
    if getattr(args, "bucket_batches", False):
        kw["bucket_batches"] = True
    return kw


def _cmd_ablation(args):
    from .configs import dad_preset
    from .exp import (
        GRANULAR_ABLATIONS,
        STANDARD_ABLATIONS,
        fused_noise_condition_experiments,
        noise_condition_experiments,
        run_ablation_suite,
        run_fused_ablation_suite,
        parse_injection_cells,
        run_fused_multi_noise_suite,
        run_multi_noise_suite,
    )

    if args.multi_noise and args.suite == "noise":
        raise ValueError(
            "--multi-noise already sweeps noise conditions; pick the "
            "mechanism suite to average (--suite standard or granular)"
        )

    def pick(suite):
        """--experiments: bound a suite to a named subset (keeps real-chip
        grids affordable; unknown names fail loudly)."""
        if not args.experiments:
            return suite
        names = [n.strip() for n in args.experiments.split(",") if n.strip()]
        unknown = [n for n in names if n not in suite]
        if unknown:
            raise ValueError(f"--experiments {unknown} not in suite "
                             f"{sorted(suite)}")
        return {n: suite[n] for n in names}

    if args.from_wav:
        cfg = dad_preset(args.corpus, **_sweep_cfg_kw(args))
        enc_cfg, enc_params, fused_cfg = _build_fused_from_args(args, cfg)
        if (args.suite == "noise" or args.multi_noise) and not args.noise_root:
            raise ValueError("--suite noise / --multi-noise with --from-wav "
                             "need --noise-root (NOISEX-92 bank)")
        suite = pick(STANDARD_ABLATIONS if args.suite == "standard"
                     else GRANULAR_ABLATIONS)
        if args.multi_noise:
            # every mechanism averaged over the injection grid
            # (run_granular_ablations*.py semantics, fused on-device)
            run_fused_multi_noise_suite(
                cfg, suite, args.from_wav, enc_cfg, enc_params,
                cells=parse_injection_cells(args.multi_noise),
                base_fused_cfg=fused_cfg, noise_root=args.noise_root,
                fold=args.fold, output_path=args.output,
                prefetch_depth=args.prefetch_depth,
                transfer_dtype=args.transfer_dtype,
            )
            return 0
        if args.suite == "noise":
            suite = pick(fused_noise_condition_experiments())
        run_fused_ablation_suite(
            cfg, suite, args.from_wav, enc_cfg, enc_params,
            base_fused_cfg=fused_cfg, noise_root=args.noise_root,
            fold=args.fold, output_path=args.output,
            prefetch_depth=args.prefetch_depth,
            transfer_dtype=args.transfer_dtype,
        )
        return 0

    if not (args.clean and args.noisy):
        raise ValueError("--clean and --noisy are required "
                         "(or use --from-wav for fused ablations)")
    cfg = dad_preset(
        args.corpus,
        clean_data_dir=args.clean,
        noisy_data_dir=args.noisy,
        **_sweep_cfg_kw(args),
    )
    if args.multi_noise:
        suite = pick(STANDARD_ABLATIONS if args.suite == "standard"
                     else GRANULAR_ABLATIONS)
        run_multi_noise_suite(
            cfg, suite, args.multi_noise.split(","), fold=args.fold,
            output_path=args.output,
        )
        return 0
    if args.suite == "noise":
        # --noisy is the BASE of the offline `root1-{type}-{snr}db` trees
        # (the reference's NOISY_DATA_DIR swap grid)
        suite = pick(noise_condition_experiments(args.noisy))
    else:
        suite = pick(STANDARD_ABLATIONS if args.suite == "standard"
                     else GRANULAR_ABLATIONS)
    run_ablation_suite(cfg, suite, fold=args.fold, output_path=args.output)
    return 0


def _cmd_sensitivity(args):
    from .configs import dad_preset
    from .exp.sensitivity import (
        run_fused_sensitivity_sweep,
        run_sensitivity_sweep,
    )

    values = [float(x) for x in args.values.split(",")] if args.values else None
    if args.from_wav:
        cfg = dad_preset(args.corpus, **_sweep_cfg_kw(args))
        enc_cfg, enc_params, fused_cfg = _build_fused_from_args(args, cfg)
        run_fused_sensitivity_sweep(
            cfg, args.knob, args.from_wav, enc_cfg, enc_params,
            base_fused_cfg=fused_cfg, noise_root=args.noise_root,
            values=values, fold=args.fold, output_dir=args.output_dir,
            prefetch_depth=args.prefetch_depth,
            transfer_dtype=args.transfer_dtype,
        )
        return 0
    if not (args.clean and args.noisy):
        raise ValueError("--clean and --noisy are required "
                         "(or use --from-wav for fused sweeps)")
    cfg = dad_preset(
        args.corpus,
        clean_data_dir=args.clean,
        noisy_data_dir=args.noisy,
        **_sweep_cfg_kw(args),
    )
    run_sensitivity_sweep(
        cfg, args.knob, values=values, fold=args.fold,
        output_dir=args.output_dir,
    )
    return 0


def _cmd_fix_format(args):
    from .audio.format import check_audio_format, fix_audio_format

    n_checked = n_fixed = 0
    for dirpath, _dirs, files in os.walk(args.root):
        for fname in sorted(files):
            if not fname.lower().endswith(".wav"):
                continue
            path = os.path.join(dirpath, fname)
            n_checked += 1
            ok, sr, ch = check_audio_format(path, target_sr=args.target_sr)
            if ok:
                continue
            if args.check_only:
                print(f"NONCONFORMING {path}: {sr} Hz, {ch} ch")
            else:
                fix_audio_format(path, path, target_sr=args.target_sr)
            n_fixed += 1
    verb = "flagged" if args.check_only else "fixed"
    print(f"checked {n_checked} wavs; {verb} {n_fixed}")
    return 0


def _cmd_preprocess(args):
    from .exp.preprocess import run_noise_grid

    encoder_cfg = None
    if args.encoder_json:
        from .configs import EncoderConfig

        encoder_cfg = EncoderConfig(**_load_encoder_json(args.encoder_json))
    snrs = [float(x) for x in args.snrs.split(",")]
    types = args.noise_types.split(",") if args.noise_types else None
    run_noise_grid(
        manifest_dir=args.manifest_dir,
        clean_root=args.clean_root,
        output_base=args.output_base,
        snrs=snrs,
        noise_types=types,
        noise_root=args.noise_root,
        root2=args.root2,
        checkpoint=args.checkpoint,
        features_base=args.features_base,
        verify=not args.no_verify,
        engine=args.engine,
        encoder_cfg=encoder_cfg,
    )
    return 0


def _cmd_analyze(args):
    if args.kind in ("disagreement", "bias", "dacp"):
        from .analysis import (
            analyze_confirmation_bias,
            analyze_dacp_evolution,
            analyze_disagreement,
        )

        fn = {
            "disagreement": analyze_disagreement,
            "bias": analyze_confirmation_bias,
            "dacp": analyze_dacp_evolution,
        }[args.kind]
        print(fn(args.results_dir, args.out_dir))
    elif args.kind == "distribution":
        from .analysis import analyze_distribution
        from .configs import CORPUS_PRESETS
        from .data import load_feature_store

        labels = dict(CORPUS_PRESETS[args.corpus]["labels"])
        store = load_feature_store(args.feat_dir, labels)
        print(analyze_distribution(store, list(labels), args.out_dir or "analysis"))
    elif args.kind == "tsne":
        from .analysis import analyze_tsne
        from .configs import dad_preset
        from .data import load_feature_store
        from .models.convert import load_torch_file, torch_state_dict_to_ssrl
        from .models.heads import init_ssrl
        import jax

        cfg = dad_preset(args.corpus)
        store = load_feature_store(args.feat_dir, cfg.label_map)
        param_sets = {}
        if args.weights_dad:
            ssrl = torch_state_dict_to_ssrl(load_torch_file(args.weights_dad))
            param_sets["dad"] = ssrl.student
        if args.weights_pretrain:
            from .models.convert import load_pretrain_head_checkpoint
            from .models.heads import load_pretrain_into_ssrl

            _h, fresh = init_ssrl(jax.random.PRNGKey(0), cfg.input_dim, cfg.hidden_dim)
            pre = load_pretrain_head_checkpoint(args.weights_pretrain)
            param_sets["pretrain"] = load_pretrain_into_ssrl(fresh, pre).student
        print(analyze_tsne(cfg, store, param_sets, args.out_dir or "analysis"))
    else:
        raise SystemExit(f"unknown analysis kind {args.kind}")
    return 0


def _add_fused_args(p):
    """The common --from-wav flag set shared by the `ablation` and
    `sensitivity` subcommands (the `dad` subcommand declares its own with
    trainer-specific help texts)."""
    p.add_argument("--from-wav", default=None, metavar="MANIFEST_DIR",
                   help="run fused from a clean wav manifest dir "
                        "(on-device injection; replaces --clean/--noisy)")
    p.add_argument("--checkpoint", default=None,
                   help="emotion2vec encoder weights (--from-wav mode)")
    p.add_argument("--encoder-dtype", default="bfloat16")
    p.add_argument("--encoder-json", default=None,
                   help="JSON of EncoderConfig overrides (fused mode)")
    p.add_argument("--snr", type=float, default=10.0,
                   help="base injection SNR dB (fused mode)")
    p.add_argument("--snr-choices", default=None,
                   help="comma list; per-clip random SNR (fused multi-SNR)")
    p.add_argument("--noise-root", default=None,
                   help="NOISEX-92 5types dir (fused bank injection; "
                        "required for ablation --suite noise)")
    p.add_argument("--noise-mode", choices=["fixed", "random"],
                   default="fixed")
    p.add_argument("--noise-type", default="babble")
    p.add_argument("--prefetch-depth", type=int, default=2)
    p.add_argument("--transfer-dtype", default=None)
    p.add_argument("--resident", choices=["auto", "on", "off"],
                   default="auto",
                   help="commit the training corpus to device HBM once and "
                        "gather batches on-device (fused mode; ~KB/step "
                        "host traffic instead of ~MBs)")
    p.add_argument("--warmup-epochs", type=int, default=None,
                   help="override WARMUP_EPOCHS (and ECDA_START_EPOCH)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--bucket-batches", action="store_true",
                   help="bucket-homogeneous training batches (opt-in "
                        "deviation from reference batch composition; "
                        "PERFORMANCE.md r5)")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="dad_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("manifest")
    p.add_argument("--corpus", choices=["iemocap", "casia", "emodb"], required=True)
    p.add_argument("--root", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--label_path", default=None)
    p.add_argument("--eval_dir", default=None, help="IEMOCAP EmoEvaluation dir")
    p.set_defaults(func=_cmd_manifest)

    p = sub.add_parser("inject")
    p.add_argument("--input_root", required=True)
    p.add_argument("--output_root", required=True)
    p.add_argument("--snr_db", type=float, default=20.0)
    p.add_argument("--manifest_path", required=True)
    p.add_argument("--noise_root", default=None)
    p.add_argument("--noise_mode", choices=["type_specific", "random"], default="type_specific")
    p.add_argument("--noise_type", default="babble")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--verify", action="store_true")
    p.add_argument("--engine", choices=["numpy", "native"], default="numpy")
    p.add_argument("--threads", type=int, default=0)
    p.set_defaults(func=_cmd_inject)

    p = sub.add_parser("extract")
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--layer", type=int, default=11)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--encoder-json", default=None)
    p.add_argument("--dp", type=int, default=0, help="dp mesh size (0 = off)")
    p.add_argument("--tp", type=int, default=1, help="encoder tensor-parallel")
    p.set_defaults(func=_cmd_extract)

    p = sub.add_parser("pretrain")
    p.add_argument("--corpus", choices=["iemocap", "casia", "emodb"], required=True)
    p.add_argument("--feat-path", required=True)
    p.add_argument("--save-dir", default="train_for_clean_models")
    p.add_argument("--max-epochs", type=int, default=100)
    p.add_argument("--folds", default=None, help="comma-separated 0-based folds")
    p.add_argument("--variant", choices=["default", "advanced", "cosine", "debug"],
                   default="default",
                   help="reference TrainingConfig variants (config.py:4-147)")
    p.set_defaults(func=_cmd_pretrain)

    p = sub.add_parser(
        "d2v-pretrain",
        help="self-supervised data2vec-2.0 pretraining of the encoder "
             "(the fairseq task the reference inherits, "
             "upstream/tasks/audio_pretraining.py)",
    )
    p.add_argument("--manifests", nargs="+", required=True,
                   help="manifest dirs (train.tsv); several mix like "
                        "MultiCorpusDataset")
    p.add_argument("--weights", default=None,
                   help="comma-separated per-manifest sampling weights")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--init-checkpoint", default=None,
                   help="emotion2vec_base.pt to continue pretraining from")
    p.add_argument("--encoder-json", default=None,
                   help="JSON of EncoderConfig overrides")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--warmup-steps", type=int, default=8_000)
    p.add_argument("--lr", type=float, default=7.5e-4)
    p.add_argument("--crop-size", type=int, default=160_000)
    p.add_argument("--min-sample-size", type=int, default=32_000,
                   help="skip clips shorter than this many samples "
                        "(task min_sample_size, audio_pretraining.py)")
    p.add_argument("--mask-prob", type=float, default=0.7)
    p.add_argument("--mask-length", type=int, default=5)
    p.add_argument("--clone-batch", type=int, default=8)
    p.add_argument("--cls-loss", type=float, default=1.0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (0 = single device)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel split of the encoder blocks "
                        "(params/EMA/AdamW moments sharded over heads/"
                        "MLP-hidden; composes with --dp)")
    p.add_argument("--binarized", action="store_true",
                   help="--manifests point at packed stores from `d2v-pack` "
                        "(BinarizedAudioDataset analogue, "
                        "audio_pretraining.py:144-156)")
    p.add_argument("--prng", choices=["threefry", "rbg"], default="threefry",
                   help="rbg = TPU hardware generator: ~1.2x faster steps "
                        "and ~13x faster compiles (different random stream)")
    p.add_argument("--ema-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="EMA-teacher STORAGE dtype (update math stays f32); "
                        "bfloat16 halves that stream's HBM traffic — "
                        "quantizes the teacher weights (PERFORMANCE.md r4)")
    p.add_argument("--adam-mu-dtype", choices=["bfloat16"], default=None,
                   help="AdamW first-moment storage dtype (optax mu_dtype)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize transformer blocks in the backward "
                        "pass (jax.checkpoint): trades recompute FLOPs for "
                        "activation HBM traffic; bit-identical gradients")
    p.add_argument("--transfer-dtype", default=None,
                   metavar="DTYPE",
                   help="ship wav batches host->device in this dtype "
                        "(e.g. bfloat16; halves upload bytes on thin links, "
                        "quantizes the waveform)")
    p.add_argument("--scan-chunk", type=int, default=1,
                   help="updates per XLA dispatch (lax.scan-stacked steps; "
                        "bit-identical to per-step, amortizes dispatch "
                        "latency; single-device only)")
    p.add_argument("--valid-manifests", nargs="+", default=None,
                   help="manifest dirs with a <valid-split>.tsv: run the "
                        "masked objective there every --valid-every steps "
                        "(dropout off, fixed masks) and keep the best state "
                        "(the fairseq validate/checkpoint_best analogue)")
    p.add_argument("--valid-split", default="valid")
    p.add_argument("--valid-every", type=int, default=1000)
    p.add_argument("--fast", action="store_true",
                   help="measured-best v5e configuration in one flag: "
                        "bf16 encoder + fast_ln/fast_softmax/tanh-GELU + "
                        "rbg PRNG (+51% over defaults, PERFORMANCE.md); "
                        "--encoder-json/--prng still override")
    p.add_argument("--resident", choices=["auto", "on", "off"],
                   default="auto",
                   help="commit the (normalized) training audio to device "
                        "memory once and gather crops on-device from "
                        "per-step index vectors instead of uploading wav "
                        "batches (bit-identical losses; single-device "
                        "per-step only — auto falls back under a mesh or "
                        "--scan-chunk > 1)")
    p.add_argument("--resident-max-bytes", type=int, default=8 << 30,
                   help="auto mode's HBM budget for the committed corpus")
    p.set_defaults(func=_cmd_d2v_pretrain)

    p = sub.add_parser(
        "d2v-pack",
        help="pack wav manifests into contiguous float32 stores for "
             "`d2v-pretrain --binarized` (decode once, mmap every epoch)",
    )
    p.add_argument("--manifests", nargs="+", required=True,
                   help="manifest dirs (with <split>.tsv)")
    p.add_argument("--out-dirs", nargs="+", required=True,
                   help="one output dir per manifest dir")
    p.add_argument("--split", default="train")
    p.add_argument("--sample-rate", type=int, default=16_000)
    p.set_defaults(func=_cmd_d2v_pack)

    p = sub.add_parser("dad")
    p.add_argument("--corpus", choices=["iemocap", "casia", "emodb"], required=True)
    p.add_argument("--clean", default=None, help="clean feature dir "
                   "(feature-level mode)")
    p.add_argument("--noisy", default=None, help="noisy feature dir "
                   "(feature-level mode)")
    # fused wav->train mode (train/fused_trainer.py): one XLA program per
    # step runs injection + extraction + the DAD update
    p.add_argument("--from-wav", default=None, metavar="MANIFEST_DIR",
                   help="train fused from a clean wav manifest dir "
                        "(on-device noise injection; replaces --clean/"
                        "--noisy). Also accepts a packed dir from "
                        "`d2v-pack` (decode-once startup)")
    p.add_argument("--checkpoint", default=None,
                   help="emotion2vec encoder weights (--from-wav mode)")
    p.add_argument("--encoder-dtype", default="bfloat16",
                   help="encoder compute dtype in fused mode")
    p.add_argument("--encoder-json", default=None,
                   help="JSON of EncoderConfig overrides (fused mode)")
    p.add_argument("--snr", type=float, default=10.0,
                   help="injection SNR dB (fused mode)")
    p.add_argument("--snr-choices", default=None,
                   help="comma list; per-clip random SNR each step "
                        "(fused mode multi-SNR)")
    p.add_argument("--noise-root", default=None,
                   help="NOISEX-92 5types dir: real-noise injection "
                        "instead of white (fused mode)")
    p.add_argument("--noise-mode", choices=["fixed", "random"],
                   default="fixed",
                   help="fixed = one type for all clips (root1), "
                        "random = per-clip type (root2)")
    p.add_argument("--noise-type", default="babble",
                   help="NOISEX type for --noise-mode fixed")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (fused mode; 0 = off)")
    p.add_argument("--tp", type=int, default=1,
                   help="encoder tensor-parallel size (fused mode)")
    p.add_argument("--weights", default=None, help="pretrain .ckpt")
    p.add_argument("--fold", default="0", help="0-based fold index or 'all'")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--name", default=None)
    p.add_argument("--scan-chunk", type=int, default=None,
                   help="batches per lax.scan dispatch (0 = per-batch steps). "
                        "Default: per-step (0) everywhere except the "
                        "host-streaming feature path (--resident off), "
                        "where 4 amortizes uploads — per-step beat chunked "
                        "scans on BOTH resident paths (feature: 11.4 vs "
                        "28.5-51.9 ms/batch at IEMOCAP scale, r5; fused: "
                        "chunk-common bucket padding, r4). In --from-wav "
                        "mode this scans the RESIDENT corpus (inert with "
                        "--resident off); ignored under --dp/--tp")
    p.add_argument("--prefetch-depth", type=int, default=2,
                   help="batches assembled ahead on a worker thread (0 = sync)")
    p.add_argument("--transfer-dtype", default=None,
                   help="ship f32 features as this dtype + upcast on device "
                        "(e.g. bfloat16; halves H2D bytes, quantizes inputs)")
    p.add_argument("--resident", choices=["auto", "on", "off"],
                   default="auto",
                   help="commit the fold's training corpus to device HBM "
                        "once (fused: cached clean features + raw wavs; "
                        "feature mode: clean + noisy feature stores) and "
                        "gather batches on-device from per-step index "
                        "vectors — ~KB/step host traffic instead of ~MBs "
                        "(auto falls back to streaming when it doesn't fit "
                        "or a mesh is given)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--warmup-epochs", type=int, default=None,
                   help="override WARMUP_EPOCHS (and ECDA_START_EPOCH)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--bucket-batches", action="store_true",
                   help="regroup each training epoch into bucket-"
                        "homogeneous batches (opt-in deviation from "
                        "reference batch composition, PARITY.md). The "
                        "reference-shaped uniform shuffle pads 3.9x more "
                        "audio than it trains on at IEMOCAP scale — one "
                        "long clip promotes the whole static-shape batch "
                        "to the 16/30 s bucket (PERFORMANCE.md r5)")
    p.set_defaults(func=_cmd_dad)

    p = sub.add_parser("infer")
    p.add_argument("--weights", required=True)
    p.add_argument("--test-data", required=True)
    p.add_argument("--output-dir", default="inference_results")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--split", choices=["test", "all"], default="test")
    p.add_argument("--teacher", action="store_true")
    p.set_defaults(func=_cmd_infer)

    p = sub.add_parser("serve", help="micro-batched prediction server")
    p.add_argument("--weights", required=True, help="DAD best .pth")
    p.add_argument("--corpus", choices=["iemocap", "casia", "emodb"],
                   default="iemocap", help="label set / preset")
    p.add_argument("--checkpoint", default=None,
                   help="emotion2vec checkpoint: enables raw-wav requests")
    p.add_argument("--encoder-dtype", default="bfloat16")
    p.add_argument("--wav-dtype", choices=["int16", "float32"],
                   default="int16",
                   help="wav batch host->device transfer dtype; int16 "
                        "halves upload bytes (lossless for PCM sources)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8476)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--teacher", action="store_true")
    p.add_argument("--no-warmup", action="store_true")
    p.set_defaults(func=_cmd_serve)

    p = sub.add_parser("ablation")
    p.add_argument("--corpus", choices=["iemocap", "casia", "emodb"], required=True)
    p.add_argument("--clean", default=None,
                   help="clean feature dir (feature-level mode)")
    p.add_argument("--noisy", default=None,
                   help="noisy feature dir (feature-level mode); with "
                        "--suite noise: the BASE dir of the offline "
                        "root1-{type}-{snr}db trees")
    # fused mode: the whole suite runs wav->train with on-device injection;
    # --suite noise sweeps the reference's 4-type x 4-SNR grid as injection
    # config swaps (one corpus decode + one clean extraction total)
    _add_fused_args(p)
    p.add_argument("--weights", default=None)
    p.add_argument("--suite", choices=["standard", "granular", "noise"],
                   default="standard")
    p.add_argument("--multi-noise", default=None,
                   help="average every suite experiment across noise "
                        "conditions (run_granular_ablations*.py semantics). "
                        "Feature mode: comma list of noisy feature dirs; "
                        "fused mode: 'grid' for the full injection grid, or "
                        "a comma list of type@snr cells (e.g. "
                        "--multi-noise babble@10,f16@0)")
    p.add_argument("--experiments", default=None,
                   help="comma-separated subset of the suite's experiment "
                        "names to run (bounds real-chip grids)")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--output", default="ablation_results.json")
    p.set_defaults(func=_cmd_ablation)

    p = sub.add_parser("sensitivity",
                       help="hyperparameter sensitivity sweep "
                            "(run_hyperparameter_sensitivity*.py)")
    p.add_argument("--corpus", choices=["iemocap", "casia", "emodb"], required=True)
    p.add_argument("--clean", default=None,
                   help="clean feature dir (feature-level mode)")
    p.add_argument("--noisy", default=None,
                   help="noisy feature dir (feature-level mode)")
    _add_fused_args(p)
    p.add_argument("--weights", default=None)
    p.add_argument("--knob", required=True,
                   help="e.g. WEIGHT_ECDA, DACP_CALIBRATION_STRENGTH_LAMBDA, "
                        "ECDA_GAMMA_DELTA")
    p.add_argument("--values", default=None, help="comma list; default grid")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--output-dir", default="sensitivity_results")
    p.set_defaults(func=_cmd_sensitivity)

    p = sub.add_parser("fix-format",
                       help="16 kHz-mono gate (check_and_fix_audio_format.py)")
    p.add_argument("--root", required=True, help="wav tree to walk")
    p.add_argument("--target-sr", type=int, default=16000)
    p.add_argument("--check-only", action="store_true")
    p.set_defaults(func=_cmd_fix_format)

    p = sub.add_parser("preprocess", help="noise-grid injection (+extraction)")
    p.add_argument("--manifest-dir", required=True)
    p.add_argument("--clean-root", required=True)
    p.add_argument("--output-base", required=True)
    p.add_argument("--snrs", default="0,10,15,20")
    p.add_argument("--noise-types", default=None,
                   help="comma list (babble,f16,...); omit for white noise")
    p.add_argument("--noise-root", default=None, help="NOISEX 5types dir")
    p.add_argument("--root2", action="store_true", help="random type per clip")
    p.add_argument("--checkpoint", default=None, help="extract features too")
    p.add_argument("--encoder-json", default=None,
                   help="JSON of EncoderConfig overrides for extraction")
    p.add_argument("--features-base", default=None)
    p.add_argument("--no-verify", action="store_true")
    p.add_argument("--engine", choices=["numpy", "native"], default="numpy",
                   help="native = threaded C++ injector (SNR-exact)")
    p.set_defaults(func=_cmd_preprocess)

    p = sub.add_parser("analyze")
    p.add_argument("--kind",
                   choices=["disagreement", "bias", "dacp", "distribution", "tsne"],
                   required=True)
    p.add_argument("--results-dir", default=None)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--feat-dir", default=None, help="for distribution/tsne")
    p.add_argument("--corpus", choices=["iemocap", "casia", "emodb"], default="iemocap")
    p.add_argument("--weights-pretrain", default=None)
    p.add_argument("--weights-dad", default=None)
    p.set_defaults(func=_cmd_analyze)

    args = parser.parse_args(argv)
    try:
        return args.func(args)
    except (FileNotFoundError, ValueError, KeyError) as e:
        parser.exit(2, f"{parser.prog}: error: {e}\n")


if __name__ == "__main__":
    sys.exit(main())
