"""Edge-case pins for the corpus-curation operators (decontamination,
repetition signals, segment dedup, PII scrub). The sf0.01 oracle gate
covers bulk parity; these pin the boundary semantics the fixture corpus
may not exercise."""

import hashlib

from temporal_vector_database_spark.operators.curation import (
    decontaminate,
    pii_scrub,
    repetition_stats,
    segment_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_decontaminate_flags_shared_ngrams_and_short_docs(spark):
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 2 eval 3-grams
            (2, "zeta eta theta iota"),  # shares none
            (3, "one two"),  # < n words -> zero n-grams
        ],
    )
    ev = _docs(spark, [(100, "alpha beta gamma delta")])
    out = {r["doc_id"]: r.asDict() for r in decontaminate(train, ev, n=3).collect()}
    assert out[1]["n_ngrams"] == 3
    assert out[1]["n_contaminated"] == 2  # 'alpha beta gamma', 'beta gamma delta'
    assert out[1]["is_contaminated"] is True
    assert out[2]["n_contaminated"] == 0 and out[2]["is_contaminated"] is False
    assert out[3] == {
        "doc_id": 3,
        "n_ngrams": 0,
        "n_contaminated": 0,
        "contamination_frac": 0.0,
        "is_contaminated": False,
    }


def test_repetition_stats_counts_and_degenerate_docs(spark):
    docs = _docs(spark, [(1, "a a a b"), (2, "solo")])
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    r1 = out[1]
    assert (r1["n_words"], r1["n_distinct_words"], r1["top_word_count"]) == (4, 2, 3)
    assert r1["top_word_frac"] == 0.75
    # bigrams: 'a a' x2, 'a b' -> top 2 of 3
    assert (r1["top_bigram_count"], r1["top_bigram_frac"]) == (2, 2 / 3)
    assert r1["passes_repetition"] is False
    r2 = out[2]
    assert (r2["n_words"], r2["top_bigram_count"], r2["top_bigram_frac"]) == (1, 0, 0.0)
    assert r2["passes_repetition"] is False  # top_word_frac == 1.0


def test_segment_dedup_first_occurrence_and_reassembly(spark):
    # width=2 segments: doc1 = [p q][r s], doc2 = [p q][x y], doc3 = [r s]
    docs = _docs(spark, [(1, "p q r s"), (2, "p q x y"), (3, "r s")])
    out = {r["doc_id"]: r.asDict() for r in segment_dedup(docs, width=2).collect()}
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["clean_hash"] == hashlib.md5(b"p q r s").hexdigest()
    # doc2 loses its first segment (doc1 owns 'p q'), keeps 'x y'
    assert out[2]["n_kept"] == 1
    assert out[2]["clean_hash"] == hashlib.md5(b"x y").hexdigest()
    # doc3 loses everything -> empty rebuild
    assert out[3]["n_kept"] == 0 and out[3]["clean_len"] == 0
    assert out[3]["clean_hash"] == hashlib.md5(b"").hexdigest()


def test_segment_dedup_partial_tail_segment(spark):
    docs = _docs(spark, [(1, "a b c d e")])
    row = segment_dedup(docs, width=2).collect()[0]
    assert row["n_segments"] == 3  # [a b][c d][e]
    assert row["clean_hash"] == hashlib.md5(b"a b c d e").hexdigest()


def test_pii_scrub_counts_and_redacts(spark):
    docs = _docs(
        spark,
        [
            (1, "mail me at bob.smith+x@corp.example.org or 192.168.0.1 then +4917012345"),
            (2, "clean text with no pii at all"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in pii_scrub(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 1, 1)
    expect = "mail me at <EMAIL> or <IP> then <PHONE>"
    assert out[1]["redacted_hash"] == hashlib.md5(expect.encode()).hexdigest()
    assert out[1]["redacted_len"] == len(expect)
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 0, 0)


def test_pii_scrub_original_text_untouched_columns(spark):
    # the scrubbed output must not leak the raw text column
    docs = _docs(spark, [(1, "a@b.co x")])
    assert set(pii_scrub(docs).columns) == {
        "doc_id",
        "n_emails",
        "n_ips",
        "n_phones",
        "redacted_len",
        "redacted_hash",
    }


def test_semantic_dedup_cluster_bucketed(spark):
    from temporal_vector_database_spark.operators.dedup import semantic_dedup

    rows = [
        (0, [1.0, 0.0]),   # centroid A
        (1, [1.0, 0.0]),   # dup of 0 (cos 1.0)
        (2, [0.0, 1.0]),   # centroid B
        (3, [0.9, 0.1]),   # near 0/1 (cos ~0.99)
        (4, [0.0, 2.0]),   # cluster B, dup of 2
        (5, [-1.0, 0.0]),  # cluster B (cos 0 beats cos -1), no near-dup
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {
        r["vec_id"]: r.asDict()
        for r in semantic_dedup(emb, min_cosine=0.9, centroid_mod=2, centroid_rem=0).collect()
    }
    assert out[0]["centroid_id"] == 0 and out[0]["is_survivor"] is True
    assert out[1]["n_near_lower"] == 1 and out[1]["is_survivor"] is False
    assert out[3]["n_near_lower"] == 2 and out[3]["is_survivor"] is False  # near 0 and 1
    assert out[2]["is_survivor"] is True
    assert out[4]["centroid_id"] == 2 and out[4]["is_survivor"] is False
    assert out[5]["centroid_id"] == 2 and out[5]["is_survivor"] is True


def test_full_curation_report_stage_attrition(spark):
    from temporal_vector_database_spark.operators.pipeline import full_curation_report

    base = [f"w{i}" for i in range(30)]
    stops = ["the", "and", "of", "to", "is"] * 2
    good = " ".join(base + stops)                      # passes everything
    rep_fail = " ".join(["the"] * 50)                  # quality ok, repetition fail
    contaminated = " ".join(
        [f"x{i}" for i in range(30)] + stops + ["q1", "q2", "q3", "q4", "q5", "q6"]
    )                                                  # shares 2 eval 5-grams
    rows = [
        (1, good, "src", len(good)),
        (2, "tiny text", "src", 9),                    # quality fail ('und' too)
        (3, rep_fail, "src", len(rep_fail)),
        (4, contaminated, "src", len(contaminated)),
        (5, good, "src", len(good)),                   # exact dup of 1
    ]
    train = spark.createDataFrame(rows, "doc_id bigint, text string, source string, n_chars bigint")
    ev = spark.createDataFrame(
        [(100, "q1 q2 q3 q4 q5 q6", "eval", 17)],
        "doc_id bigint, text string, source string, n_chars bigint",
    )
    out = {
        (r["predicted_lang"], r["source"]): r.asDict()
        for r in full_curation_report(train, ev).collect()
    }
    en = out[("en", "src")]
    assert en["n_docs"] == 4           # docs 1, 3, 4, 5
    assert en["n_quality"] == 4
    assert en["n_repetition_ok"] == 3  # doc 3 dropped
    assert en["n_clean"] == 2          # doc 4 dropped (contaminated)
    assert en["n_survivors"] == 1      # doc 5 deduped against doc 1
    assert en["survivor_tokens"] == 40
    und = out[("und", "src")]
    assert (und["n_docs"], und["n_quality"], und["n_survivors"]) == (1, 0, 0)


def test_doc_chunks_overlap_and_tail(spark):
    from temporal_vector_database_spark.operators.curation import doc_chunks

    docs = _docs(spark, [(1, "a b c d e"), (2, "x")])
    out = {
        (r["doc_id"], r["chunk_idx"]): r.asDict()
        for r in doc_chunks(docs, width=4, stride=2).collect()
    }
    # doc 1: starts 0, 2, 4 -> chunks [a b c d], [c d e], [e]
    assert out[(1, 0)]["n_words"] == 4
    assert out[(1, 0)]["chunk_hash"] == hashlib.md5(b"a b c d").hexdigest()
    assert out[(1, 1)]["n_words"] == 3
    assert out[(1, 1)]["chunk_hash"] == hashlib.md5(b"c d e").hexdigest()
    assert out[(1, 2)]["n_words"] == 1 and out[(1, 2)]["start_word"] == 4
    # doc 2: one single-word chunk
    assert out[(2, 0)]["n_words"] == 1
    assert len(out) == 4


def test_curated_dataset_sink_prunes_partitions(spark, tmp_path):
    from temporal_vector_database_spark.operators.pipeline import (
        read_curated_split,
        write_curated_dataset,
    )
    from temporal_vector_database_spark.operators.sampling import split_assign

    rows = [(i, f"text {i}", "en" if i % 2 else "de", 10 + i) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, predicted_lang string, n_tokens bigint")
    curated = split_assign(docs)  # adds the 'split' column
    path = str(tmp_path / "curated")
    write_curated_dataset(curated, path)

    got = read_curated_split(spark, path, "train", "en")
    want = {r["doc_id"] for r in curated.collect() if r["split"] == "train" and r["predicted_lang"] == "en"}
    assert {r["doc_id"] for r in got.collect()} == want and want

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("split" in ln and "predicted_lang" in ln for ln in pf), plan


def test_doc_chunks_nonoverlapping_cover_property(spark):
    # at stride == width the chunks partition the doc exactly: joined
    # chunk texts reconstruct the original word sequence
    from temporal_vector_database_spark.operators.curation import doc_chunks

    docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(11)))])
    rows = sorted(doc_chunks(docs, width=4, stride=4).collect(), key=lambda r: r["chunk_idx"])
    words = [f"t{i}" for i in range(11)]
    rebuilt_hashes = [
        hashlib.md5(" ".join(words[i : i + 4]).encode()).hexdigest()
        for i in range(0, 11, 4)
    ]
    assert [r["chunk_hash"] for r in rows] == rebuilt_hashes
    assert sum(r["n_words"] for r in rows) == 11
