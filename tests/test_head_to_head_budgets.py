"""The head-to-head's matched-schedule property: BOTH sides must spend the
same finetune budgets, and at n_opt=30000 those must be the reference's own
(main_compression.py:156-158). Round-4 session 1 shipped a one-sided bug
here (torch h/hh scaled off the mutated N_OPT global); this pins the now-
shared formula so a regression unlevels loudly instead of silently."""

import importlib.util
import os
import sys
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_h2h():
    spec = importlib.util.spec_from_file_location(
        "head_to_head", os.path.join(REPO, "scripts", "head_to_head.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_matched_budgets_reference_schedule():
    h2h = _load_h2h()
    # cifar production grouping (134 w groups, non-patch):
    # main_compression.py:156 -> max(30000//134, 50) = 223
    assert h2h.matched_budgets(30000, 134) == {"w": 223}
    # kodak_mini grouping (99 w / 25 h / 58 hh):
    # w max(30000//99,50)=303; h/hh base 15000 -> 600 / 258
    assert h2h.matched_budgets(30000, 99, 25, 58) == {
        "w": 303, "h": 600, "hh": 258}


def test_matched_budgets_reduced_schedule_floors():
    h2h = _load_h2h()
    # audio_mini at n_opt=3000: w max(3000//70,50) hits the 50 floor;
    # h/hh scale off the 15000 REFERENCE base (15000*3000/30000 = 1500),
    # NOT off the mutated N_OPT global
    b = h2h.matched_budgets(3000, 70, 6, 12)
    assert b == {"w": 50, "h": 250, "hh": 125}
    # mutating the module's N_OPT (what --n_opt does in main) must not
    # change the scaling base
    h2h.N_OPT = 3000
    assert h2h.matched_budgets(3000, 70, 6, 12) == b


def test_ours_side_overrides_equal_torch_side_budgets():
    h2h = _load_h2h()
    lvl = lambda n: SimpleNamespace(n_groups=n)
    codec = SimpleNamespace(w=lvl(99), h=lvl(25), hh=lvl(58))
    ovr = h2h._ft_overrides(codec, 6000, None)
    assert ovr == h2h.matched_budgets(6000, 99, 25, 58)
    # explicit --ft_epochs beats scaling on every level
    assert h2h._ft_overrides(codec, 6000, 77) == {"w": 77, "h": 77, "hh": 77}
    # no reduced schedule requested -> no overrides (each side spends its
    # own reference budgets)
    assert h2h._ft_overrides(codec, None, None) is None
    # non-patch codec: no h/hh keys
    codec1 = SimpleNamespace(w=lvl(134), h=None, hh=None)
    assert h2h._ft_overrides(codec1, 3000, None) == {"w": 50}


def test_ft_stop_keeps_reference_ceilings():
    """Adaptive --ft_stop mode: budgets are plateau-stop CEILINGS and must
    stay at the reference 30000-based values even under a reduced --n_opt —
    scaling them would bind before the stop fires and clip quality
    (ADVICE r4, medium: the queue2/queue3 adaptive runs were about to ship
    halved ceilings and read as 'preset does not generalize')."""
    h2h = _load_h2h()
    lvl = lambda n: SimpleNamespace(n_groups=n)
    codec = SimpleNamespace(w=lvl(99), h=lvl(25), hh=lvl(58))
    ft_stop = (40, 0.001, 80)
    assert h2h._ft_overrides(codec, 15000, None, ft_stop) is None
    # explicit --ft_epochs still wins even with a stop configured
    assert h2h._ft_overrides(codec, 15000, 77, ft_stop) == {
        "w": 77, "h": 77, "hh": 77}


def test_ft_epochs_zero_is_respected():
    """--ft_epochs 0 (zero-finetune ablation) must propagate as 0, not fall
    through a falsy-or to the reference budget (ADVICE r4, low)."""
    h2h = _load_h2h()
    lvl = lambda n: SimpleNamespace(n_groups=n)
    codec = SimpleNamespace(w=lvl(99), h=lvl(25), hh=lvl(58))
    ovr = h2h._ft_overrides(codec, None, 0)
    assert ovr == {"w": 0, "h": 0, "hh": 0}
    # the record-reporting expression in run_ours uses the same override
    # dict; emulate it here to pin the 'is not None' semantics
    rec_val = ovr["w"] if ovr is not None and "w" in ovr else 999
    assert rec_val == 0
