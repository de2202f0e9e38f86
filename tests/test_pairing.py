"""Adjacent-mention pairing parity vs `predict_gdcq.py::post_process`
(README.md:330-333 worked example + randomized)."""

from __future__ import annotations

import random

import pytest

from pytorch_bert_bilstm_crf_ner_spark.core.pairing import (
    GDCQ_OBJECT_TYPES,
    adjacent_pairs,
    adjacent_triples,
)

from .conftest import extract_function


def test_gdcq_readme_example():
    text = "多次购买了，效果不错哦，价格便宜"
    ents = [("不错", 8, "正面"), ("价格", 12, "价格"), ("便宜", 14, "正面")]
    leftover, rels = adjacent_pairs(ents, text)
    assert rels == [("价格便宜", "正面")]
    assert leftover == [("不错", 8, "正面")]


def test_matches_reference_randomized():
    ref = extract_function("predict_gdcq.py", "post_process")
    if ref is None:
        pytest.skip("reference tree unavailable")
    rng = random.Random(3)
    types = ["正面", "中性", "负面", "价格", "物流", "品质"]
    seps = "，,。！!？?"
    for _ in range(200):
        n = rng.randint(0, 60)
        text = "".join(
            rng.choice("abcdefg" + seps) for _ in range(n)
        )
        ents = []
        pos = 0
        while pos < n - 2:
            ln = rng.randint(1, 3)
            if rng.random() < 0.5:
                ents.append((text[pos : pos + ln], pos, rng.choice(types)))
            pos += ln + rng.randint(0, 3)
        ours = adjacent_pairs(ents, text)
        theirs = tuple(ref(ents, text))
        assert ours == theirs


def test_triples_form():
    text = "aa bb cc"
    ents = [("aa", 0, "NAME"), ("bb", 3, "TITLE"), ("cc", 6, "TITLE")]
    out = adjacent_triples(ents, text, ("TITLE",), pred="has_attribute")
    assert out == [
        ("aa", "has_attribute", "bb", 0),
    ]
    assert GDCQ_OBJECT_TYPES == ("正面", "中性", "负面")
