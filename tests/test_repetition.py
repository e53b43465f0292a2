"""Gopher/MassiveText repetition signals: hand-computed fixtures pin the
character-fraction definitions; flags follow the published thresholds."""

from fsst_spark.pipeline.textstats import repetition_stats


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    return {r["doc_id"]: r.asDict() for r in
            repetition_stats(df).collect()}


def test_clean_document_scores(spark):
    # 35 chars; every line/bigram/5-gram unique; the most-covering bigram
    # is "delta epsilon" (13 chars, one occurrence) -> 1300 div 35 = 37
    r = _run(spark, ["alpha beta gamma delta epsilon zeta"])[0]
    assert r["n_chars"] == 35
    assert r["dup_line_char_pct"] == 0
    assert r["dup_5gram_char_pct"] == 0
    assert r["top_bigram_char_pct"] == 13 * 100 // 35
    assert r["dup_line_char_ok"] is True
    assert r["dup_5gram_char_ok"] is True


def test_duplicate_lines_counted_with_every_occurrence(spark):
    # lines: abc, x, abc (9 chars) -> dup chars 2*3 = 6 -> 600 div 9 = 66
    r = _run(spark, ["abc\nx\nabc"])[0]
    assert r["dup_line_char_pct"] == 66
    assert r["dup_line_char_ok"] is False
    assert r["rep_keep"] is False


def test_top_bigram_coverage_counts_overlaps(spark):
    # words a a a a (7 chars): bigram "a a" occurs 3x overlapping, len 3
    # -> covered 9 of 7 chars = 128% (multiplicity-weighted; >100 is fine)
    r = _run(spark, ["a a a a"])[0]
    assert r["top_bigram_char_pct"] == 9 * 100 // 7
    assert r["top_bigram_char_ok"] is False
    assert r["dup_5gram_char_pct"] == 0  # fewer than 5 words


def test_dup_5gram_fraction(spark):
    # "w1 w2 w3 w4 w5" twice + unique tail (50 chars): the only duplicated
    # 5-gram is "w1 w2 w3 w4 w5" (14 chars, cnt 2) -> 2800 div 50 = 56
    text = "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5 unique tail here now"
    r = _run(spark, [text])[0]
    assert r["n_chars"] == 50
    assert r["dup_5gram_char_pct"] == 56
    assert r["dup_5gram_char_ok"] is False


def test_empty_and_short_docs_survive_with_zeros(spark):
    rows = _run(spark, ["", "   ", "one"])
    assert set(rows) == {0, 1, 2}
    for r in rows.values():
        assert r["n_chars"] == 0 or r["doc_id"] == 2
        assert r["dup_line_char_pct"] == 0
        assert r["dup_5gram_char_pct"] == 0
        assert r["top_bigram_char_pct"] == 0  # no bigrams at all
        assert r["rep_keep"] is True


def test_output_one_row_per_doc(spark):
    texts = ["a b c", "", "x\nx\nx", "lorem ipsum dolor sit amet " * 20]
    assert len(_run(spark, texts)) == len(texts)


def test_thresholds_pin_keep(spark):
    # 6 identical lines -> dup-line fraction ~92% -> reject;
    # all-unique words -> every signal small -> keep
    bad = "\n".join(["same line!"] * 6)
    good = "\n".join(
        f"zeta{i} omega{i} kappa{i} lambda{i} mu{i}" for i in range(6))
    rows = _run(spark, [bad, good])
    assert rows[0]["rep_keep"] is False
    assert rows[1]["rep_keep"] is True
