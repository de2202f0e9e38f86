"""Span metric math parity vs `utils/metricsUtils.py`."""

from __future__ import annotations

import random

import pytest

from pytorch_bert_bilstm_crf_ner_spark.core.metrics import (
    calculate_metric,
    get_p_r_f,
    micro_prf,
)

from .conftest import load_reference_module


def test_basic():
    gt = [("a", 0), ("bb", 3)]
    pred = [("a", 0), ("bb", 4), ("c", 9)]
    assert calculate_metric(gt, pred) == (1, 2, 1)
    p, r, f1 = get_p_r_f(1, 2, 1)
    assert abs(p - 1 / 3) < 1e-12 and abs(r - 0.5) < 1e-12
    assert get_p_r_f(0, 0, 0) == (0.0, 0.0, 0.0)


def test_matches_reference_randomized():
    ns = load_reference_module("utils/metricsUtils.py")
    if ns is None:
        pytest.skip("reference tree unavailable")
    rng = random.Random(5)
    for _ in range(200):
        gt = [(chr(97 + rng.randrange(4)), rng.randrange(5)) for _ in range(rng.randint(0, 6))]
        pred = [(chr(97 + rng.randrange(4)), rng.randrange(5)) for _ in range(rng.randint(0, 6))]
        assert list(ns["calculate_metric"](gt, pred)) == list(calculate_metric(gt, pred))
        tp, fp, fn = calculate_metric(gt, pred)
        assert list(ns["get_p_r_f"](tp, fp, fn)) == list(get_p_r_f(tp, fp, fn))


def test_micro():
    per_type = {"A": (2, 1, 0), "B": (0, 1, 2)}
    p, r, f1 = micro_prf(per_type)
    assert abs(p - 0.5) < 1e-12 and abs(r - 0.5) < 1e-12 and abs(f1 - 0.5) < 1e-12
