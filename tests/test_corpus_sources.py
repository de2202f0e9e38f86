"""Reference-corpus scans (S1-S4) against the reference's own data files
(read-only) and its own process.py logic, exec'd as a live oracle."""

from __future__ import annotations

import os

import pytest

REF = "/root/reference"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree unavailable"
)


@needs_ref
def test_bmes_parse_matches_mid_data():
    """core/bmes.py must reproduce data/cner/mid_data/dev.json exactly
    (that file was produced by the reference's own parser)."""
    import json

    from pytorch_bert_bilstm_crf_ner_spark.core.bmes import parse_bmes_lines

    lines = open(
        f"{REF}/data/cner/raw_data/dev.char.bmes", encoding="utf-8"
    ).read().splitlines()
    parsed = parse_bmes_lines(lines)
    golden = json.load(open(f"{REF}/data/cner/mid_data/dev.json", encoding="utf-8"))
    parsed = [(t, lab) for t, lab in parsed if t]
    assert len(parsed) == len(golden)
    for (text, labels), g in zip(parsed, golden):
        assert text == g["text"]
        assert [list(lab) for lab in labels] == [list(x) for x in g["labels"]]


@needs_ref
def test_read_bmes_spark(spark):
    from pytorch_bert_bilstm_crf_ner_spark.sources.corpus import (
        gold_mentions,
        read_bmes,
    )

    df = read_bmes(spark, f"{REF}/data/cner/raw_data/dev.char.bmes")
    rows = df.orderBy("doc_id").limit(3).collect()
    assert rows[0]["text"].startswith("吴重阳")
    labs = rows[0]["labels"]
    assert labs[0]["mention"] == "吴重阳" and labs[0]["start"] == 0
    gm = gold_mentions(df)
    assert gm.filter("type = 'NAME'").count() > 0


@needs_ref
def test_read_mid_data_matches_json(spark):
    import json

    from pytorch_bert_bilstm_crf_ner_spark.sources.corpus import read_mid_data

    df = read_mid_data(spark, f"{REF}/data/cner/mid_data/dev.json")
    golden = json.load(open(f"{REF}/data/cner/mid_data/dev.json", encoding="utf-8"))
    got = {r["doc_id"]: r for r in df.collect()}
    assert len(got) == len(golden)
    g0 = golden[0]
    r0 = got[g0["id"]]
    assert r0["text"] == g0["text"]
    assert [
        [lab["span_id"], lab["type"], lab["start"], lab["end"], lab["mention"]]
        for lab in r0["labels"]
    ] == [list(x) for x in g0["labels"]]


@needs_ref
def test_read_jsonlines_matches_reference_parser(spark):
    """Spark S2 scan vs the reference weibo process.py get_data logic."""
    import json

    from pytorch_bert_bilstm_crf_ner_spark.sources.corpus import (
        read_jsonlines_entities,
    )

    path = f"{REF}/data/weibo/raw_data/weibo_ner_dev.txt"
    if not os.path.exists(path):
        pytest.skip("weibo corpus absent")
    # reference logic (data/weibo/raw_data/process.py:4-36), inline
    ref_rows = []
    for line in open(path, encoding="utf-8"):
        d = json.loads(line)
        if not d["text"]:
            continue
        labels = [
            ["T%d" % j, e["entity_type"], e["entity_index"]["begin"],
             e["entity_index"]["end"], e["entity"]]
            for j, e in enumerate(d["entity_list"])
        ]
        ref_rows.append((d["text"], labels))

    got = sorted(
        (
            r["text"],
            str(
                [
                    [lab["span_id"], lab["type"], lab["start"], lab["end"],
                     lab["mention"]]
                    for lab in r["labels"]
                ]
            ),
        )
        for r in read_jsonlines_entities(spark, path).collect()
    )
    want = sorted((text, str(labels)) for text, labels in ref_rows)
    assert got == want


@needs_ref
def test_read_gdcq_csv(spark):
    from pytorch_bert_bilstm_crf_ner_spark.sources.corpus import read_gdcq_csv

    path = f"{REF}/data/gdcq/raw_data/Train_merge.csv"
    if not os.path.exists(path):
        pytest.skip("gdcq corpus absent")
    df = read_gdcq_csv(spark, path)
    assert {"AspectTerms", "OpinionTerms", "Polarities", "text"} <= set(df.columns)
    assert df.count() > 100


@needs_ref
def test_gdcq_to_mid_matches_reference(spark):
    """Spark S3 transform vs the reference's pandas loop
    (`data/gdcq/raw_data/process.py:66-98`), quirks included."""
    import pandas as pd

    from pytorch_bert_bilstm_crf_ner_spark.sources.corpus import (
        gdcq_to_mid,
        read_gdcq_csv,
    )

    path = f"{REF}/data/gdcq/raw_data/Train_merge.csv"
    if not os.path.exists(path):
        pytest.skip("gdcq corpus absent")
    got = {r["doc_id"]: r for r in gdcq_to_mid(read_gdcq_csv(spark, path)).collect()}

    data = pd.read_csv(path, encoding="utf-8")
    id_set, res, tmp = set(), [], {}
    for _, d in data.iterrows():
        did, aspect, a_s, a_e, opinion, o_s, o_e, cat, pol, text = (
            d[1], d[2], d[3], d[4], d[5], d[6], d[7], d[8], d[9], d[10]
        )
        if did not in id_set:
            if tmp:
                res.append(tmp)
            id_set.add(did)
            tmp = {"id": did, "text": text, "labels": []}
        try:
            if aspect != "_":
                tmp["labels"].append(["T0", cat, int(a_s), int(a_e), aspect])
            if cat != "_":
                tmp["labels"].append(["T0", pol, int(o_s), int(o_e), opinion])
        except Exception:
            continue
    if tmp:
        res.append(tmp)

    assert len(got) == len(res)
    for doc in res:
        r = got[doc["id"]]
        assert r["text"] == doc["text"]
        assert [
            (lab["span_id"], lab["type"], lab["start"], lab["end"], lab["mention"])
            for lab in r["labels"]
        ] == [tuple(x) for x in doc["labels"]]


def test_read_bmes_multifile_doc_ids_unique(spark, tmp_path):
    """Directory scans must not collide doc_ids across files (round-1 bug:
    doc_id was the per-file sentence index)."""
    from pytorch_bert_bilstm_crf_ner_spark.sources.corpus import read_bmes

    body = "高 B-NAME\n勇 E-NAME\n： O\n\n男 O\n， O\n\n"
    (tmp_path / "a.char.bmes").write_text(body, encoding="utf-8")
    (tmp_path / "b.char.bmes").write_text(body, encoding="utf-8")
    df = read_bmes(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 4  # 2 sentences x 2 files
    assert len({r["doc_id"] for r in rows}) == 4
    # within-file ordering is preserved by the low bits
    per_file = sorted(r["doc_id"] for r in rows)
    assert (per_file[1] - per_file[0], per_file[3] - per_file[2]) == (1, 1)
