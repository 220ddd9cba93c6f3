"""Cross-compatibility proof: the REFERENCE's own analysis scripts consume
this framework's training artifacts unmodified.

These tests run the upstream analyzers (pure pandas/matplotlib CLIs) as
subprocesses against a training_history.json / confirmation_bias_log.json
produced by our DAD trainer. Skipped when the reference checkout is absent
(it is not shipped with this framework)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.configs import (
    dad_preset,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.data import (
    load_feature_store,
)
from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.dad_trainer import (
    CrossDomainTrainer,
)

from helpers import make_iemocap_dir

REF = "/root/reference/IEMOCAP/DAD-train-IEMOCAP"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def reports_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refcompat")
    clean, *_ = make_iemocap_dir(tmp / "clean", n=48, dim=8)
    noisy, *_ = make_iemocap_dir(tmp / "noisy", n=48, dim=8, seed=5)
    cfg = dad_preset(
        "iemocap", input_dim=8, hidden_dim=8, batch_size=16, epochs=16,
        warmup_epochs=2, ecda_start_epoch=2, weight_ramp_epochs=4,
        num_tracked_samples=8,  # enable bias tracking on the tiny corpus
        results_base_dir=str(tmp / "results"),
    )
    cs = load_feature_store(str(clean), cfg.label_map)
    ns = load_feature_store(str(noisy), cfg.label_map)
    trainer = CrossDomainTrainer(cfg, fold=0, clean_store=cs, noisy_store=ns)
    trainer.train()
    rd = os.path.join(trainer.results_dir, "reports")
    assert os.path.exists(os.path.join(rd, "training_history.json"))
    return rd


def _run(script, *args):
    env = dict(os.environ, MPLBACKEND="Agg")
    return subprocess.run(
        [sys.executable, os.path.join(REF, script), *args],
        capture_output=True, text=True, env=env, timeout=300,
    )


def test_reference_dacp_evolution_reads_our_history(reports_dir, tmp_path):
    out = str(tmp_path / "dacp_out")
    r = _run("analyze_dacp_evolution.py",
             "--path", os.path.join(reports_dir, "training_history.json"),
             "--output", out, "--warmup", "2",
             "--classes", "ang", "hap", "neu", "sad")
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    reports = [f for _r, _d, fs in os.walk(out) for f in fs if f.endswith(".json")]
    assert reports, "reference analyzer wrote no report"


def test_reference_disagreement_reads_our_history(reports_dir, tmp_path):
    out = str(tmp_path / "dis_out")
    r = _run("analyze_disagreement.py",
             "--path", os.path.join(reports_dir, "training_history.json"),
             "--output", out, "--warmup", "2", "--validation_interval", "5")
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    pngs = [f for _r, _d, fs in os.walk(out) for f in fs if f.endswith(".png")]
    assert pngs, "reference analyzer wrote no plots"


def test_confirmation_bias_log_schema_matches_reference(reports_dir):
    # analyze_confirmation_bias.py's trend polyfit degenerates on tiny smoke
    # runs (constant zero flip counts -> SVD failure, also on the
    # reference's own degenerate runs), so assert the load-bearing part:
    # our log records carry exactly the reference's fields/types
    # (reference train.py:424-437).
    log = json.load(open(os.path.join(reports_dir, "confirmation_bias_log.json")))
    assert isinstance(log, list) and log
    for entry in log[:50]:
        assert set(entry) == {
            "epoch", "sample_id", "pseudo_label", "certainty_score",
            "is_masked_in",
        }
        assert isinstance(entry["epoch"], int)
        assert isinstance(entry["sample_id"], int)
        assert isinstance(entry["pseudo_label"], int)
        assert isinstance(entry["certainty_score"], float)
        assert isinstance(entry["is_masked_in"], bool)
