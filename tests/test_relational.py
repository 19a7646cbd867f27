"""Skew-resistant relational helpers: exactness of the two-phase salted
top-k against the single-window plan it replaces."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.relational import two_phase_topk
from temporal_vector_database_spark.sources.tables import load_events


def _plain_topk(e, k=3):
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("user_id", "event_id", "rank")
    )


def test_two_phase_topk_matches_single_window(spark, sf_dir):
    e = load_events(spark, sf_dir).select("event_id", "user_id", "value")
    expected = {(r.user_id, r.event_id, r.rank) for r in _plain_topk(e).collect()}
    for n_salt in (1, 4, 16):  # result must be salt-count invariant
        got = two_phase_topk(
            e,
            ["user_id"],
            [F.desc("value"), F.asc("event_id")],
            k=3,
            salt_col="event_id",
            n_salt=n_salt,
        ).select("user_id", "event_id", "rank")
        assert {(r.user_id, r.event_id, r.rank) for r in got.collect()} == expected


def test_two_phase_topk_hot_key(spark):
    """A single dominant key (the skew case the operator exists for):
    partial pass keeps ≤ k rows per salt bucket, final ranks are exact."""
    rows = [("hot", i, float(i % 97)) for i in range(2000)] + [
        ("cold", 9001, 5.0),
        ("cold", 9002, 3.0),
    ]
    df = spark.createDataFrame(rows, "key string, row_id long, score double")
    got = two_phase_topk(
        df,
        ["key"],
        [F.desc("score"), F.asc("row_id")],
        k=2,
        salt_col="row_id",
        n_salt=8,
    ).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.key, []).append((r.rank, r.row_id, r.score))
    assert sorted(by_key["cold"]) == [(1, 9001, 5.0), (2, 9002, 3.0)]
    # hot: max score 96.0 at the two smallest row_ids with score 96
    hot = sorted(by_key["hot"])
    assert [h[2] for h in hot] == [96.0, 96.0]
    assert hot[0][1] == 96 and hot[1][1] == 193


def test_salted_join_matches_plain_join(spark, sf_dir):
    import os

    from temporal_vector_database_spark.operators.relational import salted_join

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = {tuple(r) for r in li.join(o, "l_orderkey").collect()}
    for n_salt in (1, 8):
        got = {
            tuple(r)
            for r in salted_join(li, o, ["l_orderkey"], n_salt=n_salt).collect()
        }
        assert got == plain and len(got) > 0


def test_salted_left_join_keeps_unmatched_once(spark):
    from temporal_vector_database_spark.operators.relational import salted_join

    fact = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, rid long"
    )
    dim = spark.createDataFrame([("a", "dim-a")], "k string, attr string")
    got = sorted(
        tuple(r) for r in salted_join(fact, dim, ["k"], n_salt=4, how="left").collect()
    )
    assert got == [("a", 1, "dim-a"), ("a", 2, "dim-a"), ("b", 3, None)]


def test_register_driver_views_enables_pure_sql(spark, sf_dir):
    from temporal_vector_database_spark.sources.tables import register_driver_views

    names = register_driver_views(spark, sf_dir)
    assert {"lineitem", "orders", "events", "versions"} <= set(names)
    got = spark.sql(
        """
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).collect()
    assert len(got) >= 2 and all(r["n"] > 0 for r in got)
    # the versions fixture view serves the engine's own tables too
    assert spark.sql("SELECT count(*) AS n FROM versions").first()["n"] > 0


def test_events_funnel_strict_ordering(spark, tmp_path):
    """A purchase BEFORE the first click (or a click before the first
    view) must not advance the funnel — steps count only in order."""
    import datetime as dt

    from temporal_vector_database_spark.plans.registry import q_events_funnel

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1: proper view -> click -> purchase
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase", 1.0, "{}"),
        # u2: purchase first, then view -> click (purchase never recounts)
        (4, t0, 2, "purchase", 1.0, "{}"),
        (5, t0 + dt.timedelta(minutes=1), 2, "view", 1.0, "{}"),
        (6, t0 + dt.timedelta(minutes=2), 2, "click", 1.0, "{}"),
        # u3: click only
        (7, t0, 3, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    src = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(src + "/events.parquet")
    out = {r["user_id"]: r["steps_completed"] for r in q_events_funnel(spark, src).collect()}
    assert out == {1: 3, 2: 2, 3: 0}


def test_events_retention_cohort_offsets(spark, tmp_path):
    import datetime as dt

    from temporal_vector_database_spark.plans.registry import q_events_retention

    d0 = dt.datetime(2024, 1, 1, 5)
    rows = [
        # u1 first active day 0, returns day 2; u2 first active day 1 only
        (1, d0, 1, "view", 1.0, "{}"),
        (2, d0 + dt.timedelta(days=2), 1, "click", 1.0, "{}"),
        (3, d0 + dt.timedelta(days=1), 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    src = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(src + "/events.parquet")
    got = {
        (r["cohort_day"] - 19723, r["day_offset"]): r["n_active"]
        for r in q_events_retention(spark, src).collect()
    }  # 19723 = days(2024-01-01)
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_key_skew_profile_exact_on_crafted_skew(spark):
    """A deliberately skewed key distribution: counts, shares, ranks,
    and corpus totals are exact; ties rank by key."""
    from temporal_vector_database_spark.operators.relational import (
        key_skew_profile,
    )

    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("a",)] * 1 + [("b",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [
        (r.rank, r.k, r.n, r.share, r.total_rows, r.n_distinct_keys)
        for r in key_skew_profile(df, ("k",), top_n=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == [
        (1, "hot", 6, 6 / 11, 11, 4),
        (2, "warm", 3, 3 / 11, 11, 4),
        (3, "a", 1, 1 / 11, 11, 4),  # tie with b -> key order
    ]


def test_dataset_diff_statuses(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from temporal_vector_database_spark.operators.relational import dataset_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "id long, payload string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, None), (5, "e")], "id long, payload string"
    )
    got = {r.id: r.status for r in
           dataset_diff(old, new, ("id",), ("payload",)).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged", 5: "added"}


def test_group_entropy_uniform_and_degenerate(spark):
    """k equal categories at a power of two give exactly log2(k) bits;
    a single-category key gives exactly 0."""
    from temporal_vector_database_spark.operators.relational import group_entropy

    rows = (
        [(1, f"c{i % 4}") for i in range(8)]    # 4 equal categories -> 2 bits
        + [(2, "only") for _ in range(5)]        # 1 category -> 0 bits
        + [(3, "a"), (3, "a"), (3, "b")]         # 2/3 vs 1/3 split
    )
    df = spark.createDataFrame(rows, "k long, cat string")
    got = {r.k: r for r in group_entropy(df, ("k",), "cat").collect()}
    assert got[1].entropy_bits == 2.0 and got[1].n_categories == 4
    assert got[2].entropy_bits == 0.0 and got[2].entropy_num_units == 0
    # fixed-point surrogate is within the interp error of true H(1/3,2/3)
    import math

    true_h = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(got[3].entropy_bits - true_h) < 0.1


def test_dataset_diff_unambiguous_digest(spark):
    """ADVICE r05: boundary-shifted multi-column payloads and NULL<->''
    flips must report 'changed' (the old concat_ws('') digest hashed
    them identically)."""
    from temporal_vector_database_spark.operators.relational import dataset_diff

    old = spark.createDataFrame(
        [(1, "ab", "c"), (2, None, "x"), (3, "same", "same")],
        "id int, a string, b string",
    )
    new = spark.createDataFrame(
        [(1, "a", "bc"), (2, "", "x"), (3, "same", "same")],
        "id int, a string, b string",
    )
    got = {r.id: r.status
           for r in dataset_diff(old, new, ("id",), ("a", "b")).collect()}
    assert got == {1: "changed", 2: "changed", 3: "unchanged"}


def test_table_checksum_detects_any_change_and_is_order_invariant(spark):
    """Fingerprint equality <=> row-identical content: any single-cell
    change, row add, or row drop flips at least one fingerprint;
    reordering/partitioning changes nothing; NULL vs '' differ."""
    from temporal_vector_database_spark.operators.relational import table_checksum

    rows = [(i, f"t{i}", "en" if i % 2 else None) for i in range(50)]
    base = spark.createDataFrame(rows, "id long, text string, lang string")

    def fp(df):
        r = table_checksum(df, ("id",), ("text", "lang")).collect()[0]
        return (r.n_rows, r.xor_hi, r.xor_lo)

    want = fp(base)
    # order / partitioning invariance
    assert fp(base.orderBy(F.desc("id")).repartition(7)) == want
    # single cell change
    changed = base.withColumn(
        "text", F.when(F.col("id") == 17, F.lit("t17x")).otherwise(F.col("text"))
    )
    assert fp(changed) != want
    # NULL vs '' is a change
    nulled = base.withColumn(
        "lang", F.when(F.col("id") == 0, F.lit("")).otherwise(F.col("lang"))
    )
    assert fp(nulled) != want
    # row drop changes n_rows AND the xor
    dropped = base.where(F.col("id") != 3)
    got = table_checksum(dropped, ("id",), ("text", "lang")).collect()[0]
    assert got.n_rows == 49 and (got.xor_hi, got.xor_lo) != want[1:]

    # grouped form: per-group fingerprints localize the difference
    g1 = {r.lang: (r.n_rows, r.xor_hi, r.xor_lo)
          for r in table_checksum(base, ("id",), ("text",), ("lang",)).collect()}
    g2 = {r.lang: (r.n_rows, r.xor_hi, r.xor_lo)
          for r in table_checksum(changed, ("id",), ("text",), ("lang",)).collect()}
    diff = {k for k in g1 if g1[k] != g2[k]}
    assert diff == {"en"}  # id 17 is odd -> 'en' group


def test_streaming_checksum_state_equals_batch_and_replay(spark, tmp_path):
    """Append-only fingerprint fold: 3 micro-batches commit the same
    fingerprint as one-shot table_checksum over all rows (global AND
    grouped); head redelivery is a no-op."""
    from temporal_vector_database_spark.operators.relational import table_checksum
    from temporal_vector_database_spark.streaming.checksum import (
        process_checksum_batch,
        read_checksum_state,
    )

    rows = [(i, f"payload {i}", "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, text string, grp string")
    state = str(tmp_path / "ck")
    kw = dict(key_cols=("id",), compare_cols=("text",), group_cols=("grp",))
    batches = [df.where(F.col("id") % 3 == r) for r in range(3)]
    for bid, b in enumerate(batches):
        process_checksum_batch(b, bid, state, **kw)

    def canon(d):
        return sorted(tuple(r) for r in d.collect())

    want = canon(table_checksum(df, **kw))
    assert canon(read_checksum_state(spark, state)) == want
    process_checksum_batch(batches[2], 2, state, **kw)  # head redelivery
    assert canon(read_checksum_state(spark, state)) == want
