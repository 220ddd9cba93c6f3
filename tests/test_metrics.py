import json

import numpy as np
import sklearn.metrics as sk

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.eval import (
    accuracy,
    balanced_accuracy,
    best_detailed_results,
    confusion_matrix,
    evaluate_domain,
    f1_scores,
    final_test_report,
    precision_recall_fscore_support,
)


def _cases(rng):
    C = 4
    yield rng.integers(0, C, 200), rng.integers(0, C, 200)
    # skewed predictions (some classes never predicted)
    yield rng.integers(0, C, 100), np.zeros(100, int)
    # a class absent from y_true
    yt = rng.integers(0, 3, 150)
    yield yt, rng.integers(0, C, 150)
    # perfect
    yt = rng.integers(0, C, 50)
    yield yt, yt.copy()


def test_metrics_match_sklearn(rng):
    C = 4
    for y_true, y_pred in _cases(rng):
        np.testing.assert_allclose(
            accuracy(y_true, y_pred), sk.accuracy_score(y_true, y_pred)
        )
        np.testing.assert_allclose(
            balanced_accuracy(y_true, y_pred, C),
            sk.balanced_accuracy_score(y_true, y_pred),
        )
        np.testing.assert_array_equal(
            confusion_matrix(y_true, y_pred, C),
            sk.confusion_matrix(y_true, y_pred, labels=range(C)),
        )
        p, r, f, s = precision_recall_fscore_support(y_true, y_pred, C)
        sp, sr, sf, ss = sk.precision_recall_fscore_support(
            y_true, y_pred, labels=range(C), zero_division=0
        )
        np.testing.assert_allclose(p, sp)
        np.testing.assert_allclose(r, sr)
        np.testing.assert_allclose(f, sf)
        np.testing.assert_array_equal(s, ss)
        ours = f1_scores(y_true, y_pred, C)
        np.testing.assert_allclose(
            ours["weighted"],
            sk.f1_score(y_true, y_pred, average="weighted", zero_division=0),
        )
        np.testing.assert_allclose(
            ours["macro"],
            sk.f1_score(y_true, y_pred, average="macro", zero_division=0),
        )


def test_report_schema(tmp_path, rng):
    y_true = rng.integers(0, 4, 80)
    y_pred = rng.integers(0, 4, 80)
    res = evaluate_domain(y_true, y_pred, 4)
    noise_info = {
        "root_type": "root1",
        "noise_type": "babble",
        "db_value": "10db",
        "display_name": "root1-babble-10db",
    }
    path = best_detailed_results(
        str(tmp_path), noise_info, fold=0, epoch=41, clean_results=res,
        noisy_results=res, class_names=["ang", "hap", "neu", "sad"],
    )
    assert path.endswith("BEST_detailed_results_epoch_42.json")
    data = json.load(open(path))
    # the ablation harness scrapes these exact keys
    assert data["summary"]["noisy"]["w_acc"].endswith("%")
    assert data["info"]["fold"] == 1
    assert data["details"]["class_names"] == ["ang", "hap", "neu", "sad"]
    assert len(data["details"]["clean"]["f1"]) == 4

    fpath = final_test_report(str(tmp_path), noise_info, 0, res, res, 55.5)
    fdata = json.load(open(fpath))
    assert "final_test_results" in fdata
    assert fdata["comparison_with_validation"][
        "validation_best_noisy_weighted_acc"
    ] == "55.50%"


def test_macro_f1_excludes_absent_classes():
    # sklearn with labels=None averages over labels observed in y_true or
    # y_pred only (the reference never passes labels=)
    from sklearn.metrics import f1_score as sk_f1

    from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.eval.metrics import (
        f1_scores,
    )

    y_true = np.array([0, 0, 1, 1, 2])
    y_pred = np.array([0, 1, 1, 1, 2])  # class 3 absent from both
    ours = f1_scores(y_true, y_pred, num_classes=4)
    want = sk_f1(y_true, y_pred, average="macro", zero_division=0)
    assert abs(ours["macro"] - want) < 1e-12
