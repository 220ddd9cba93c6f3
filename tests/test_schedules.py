"""LR scheduler parity with the torch schedulers the reference selects
(train_for_clean.py:157-173, DAD train.py:363)."""

import numpy as np
import torch

from robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu.train.schedules import (
    CosineAnnealingLR,
    CosineAnnealingWarmRestarts,
    ReduceLROnPlateau,
    StepLR,
)


def _torch_lrs(sched_cls, steps, base_lr=0.1, per_epoch=True, losses=None, **kw):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = sched_cls(opt, **kw)
    lrs = []
    for e in range(steps):
        lrs.append(opt.param_groups[0]["lr"])
        if losses is not None:
            sched.step(losses[e])
        else:
            sched.step()
    return lrs


def test_cosine_annealing_matches_torch():
    ours = CosineAnnealingLR(0.1, t_max=10)
    ref = _torch_lrs(torch.optim.lr_scheduler.CosineAnnealingLR, 10, T_max=10)
    mine = [0.1] + [ours.step(e) for e in range(1, 10)]
    np.testing.assert_allclose(mine, ref, rtol=1e-6)


def test_warm_restarts_matches_torch():
    ours = CosineAnnealingWarmRestarts(0.1, t_0=4, t_mult=2, eta_min=1e-6)
    ref = _torch_lrs(
        torch.optim.lr_scheduler.CosineAnnealingWarmRestarts, 13,
        T_0=4, T_mult=2, eta_min=1e-6,
    )
    mine = [0.1] + [ours.step(e) for e in range(1, 13)]
    np.testing.assert_allclose(mine, ref, rtol=1e-5)


def test_step_lr_matches_torch():
    ours = StepLR(0.1, step_size=3, gamma=0.5)
    ref = _torch_lrs(torch.optim.lr_scheduler.StepLR, 10, step_size=3, gamma=0.5)
    mine = [0.1] + [ours.step(e) for e in range(1, 10)]
    np.testing.assert_allclose(mine, ref, rtol=1e-6)


def test_plateau_matches_torch():
    losses = [1.0, 0.9, 0.9, 0.9, 0.91, 0.92, 0.93, 0.94, 0.95, 0.96, 0.97, 0.98]
    ours = ReduceLROnPlateau(0.1, factor=0.5, patience=2, min_lr=1e-6)
    ref = _torch_lrs(
        torch.optim.lr_scheduler.ReduceLROnPlateau, len(losses),
        losses=losses, factor=0.5, patience=2, min_lr=1e-6,
    )
    mine = []
    lr = 0.1
    for e, loss in enumerate(losses):
        mine.append(lr)
        lr = ours.step(e + 1, loss)
    np.testing.assert_allclose(mine, ref, rtol=1e-6)
