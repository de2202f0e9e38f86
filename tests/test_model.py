"""Deterministic tagger invariants: reproducibility, char-offset
correctness, batch-grouping independence, long-text cutting."""

from __future__ import annotations

from pytorch_bert_bilstm_crf_ner_spark.core.model import (
    DeterministicTagger,
    TaggerConfig,
)

TEXTS = [
    "the fast key order sort table scan merge part window small hash",
    "spark group query row data slow small filter customer line the batch value",
    "hash join beats merge sort in spark query",
]


def test_reproducible_across_instances():
    a = DeterministicTagger().tag_batch(TEXTS)
    b = DeterministicTagger().tag_batch(TEXTS)
    assert a == b


def test_offsets_are_char_offsets():
    for text, spans in zip(TEXTS, DeterministicTagger().tag_batch(TEXTS)):
        for mention, start, _ in spans:
            assert text[start : start + len(mention)] == mention


def test_batch_grouping_invariance():
    """Tags must not depend on which rows share a batch (determinism under
    any partitioning / Arrow batch split)."""
    tagger = DeterministicTagger()
    whole = tagger.tag_batch(TEXTS)
    solo = [tagger.tag_batch([t])[0] for t in TEXTS]
    assert whole == solo


def test_long_text_cut_and_reoffset():
    tagger = DeterministicTagger(TaggerConfig(max_seq_len=32))
    text = " ".join(["table scan merge"] * 20)
    (spans,) = tagger.tag_batch([text])
    assert spans, "expected mentions in long text"
    for mention, start, _ in spans:
        assert text[start : start + len(mention)] == mention


def test_multiword_mentions_found():
    (spans,) = DeterministicTagger().tag_batch(["run a table scan then hash join now"])
    got = {(m, t) for m, _, t in spans}
    assert ("table scan", "PRO") in got
    assert ("hash join", "PRO") in got


def test_mid_linear_layer_m4():
    """M4: the mid_linear block (`bert_ner_model.py:221-227,276`) between
    feature layer and classifier — valid spans, deterministic, and
    actually changing the emissions; default (None) path untouched."""
    import numpy as np

    from pytorch_bert_bilstm_crf_ner_spark.core.model import (
        DeterministicTagger,
        TaggerConfig,
    )

    texts = ["run a table scan then hash join now", "spark query merge"]
    base = DeterministicTagger(TaggerConfig())
    mid = DeterministicTagger(TaggerConfig(mid_dim=16))
    assert mid.mid_w is not None and mid.mid_w.shape == (32, 16)
    em_b, _ = base.emissions(texts)
    em_m, _ = mid.emissions(texts)
    assert em_b.shape[:2] == em_m.shape[:2]
    assert not np.allclose(em_b, em_m)
    spans = mid.tag_batch(texts)
    for text, sp in zip(texts, spans):
        for m, s, _ in sp:
            assert text[s : s + len(m)] == m
    assert spans == DeterministicTagger(TaggerConfig(mid_dim=16)).tag_batch(texts)
    # bilstm feature + mid linear compose
    combo = DeterministicTagger(
        TaggerConfig(feature_layer="bilstm", mid_dim=16)
    )
    assert combo.tag_batch(texts) == combo.tag_batch(texts)
