"""Subword tokenization: corpus-derived vocabulary + greedy
longest-match-first (WordPiece-inference-style, Wu et al. 2016)
segmentation as an Arrow-batched UDF (beyond-reference; the token
accounting layer a training pipeline runs between curation and
packing).

Two halves, split by what each engine can express:

- :func:`build_subword_vocab` — the vocabulary (top-K character
  n-grams by frequency) is pure DataFrame aggregation, deterministic
  ties included.
- :func:`wordpiece_tokenize` — greedy segmentation is inherently
  iterative per word (each match advances the cursor), so it runs as a
  ``mapInPandas`` Arrow UDF over a BROADCAST vocab set — the standard
  pattern for the genuinely-non-relational inner loop. Not ANSI-SQL
  expressible; its driver gate is rows-only by design, with the
  semantic invariants (segmentation covers the word exactly;
  longest-match-first; OOV single-char fallback) pinned in unit tests.

Scale posture: vocab build is one gram-keyed count + a K-row top-K;
tokenization is a narrow per-partition pass (vocab broadcast once per
executor), no shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_subword_vocab(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 256,
    max_len: int = 4,
) -> DataFrame:
    """Top-``vocab_size`` character n-grams (lengths 1..max_len) of the
    corpus' whitespace words, by (count desc, gram asc) — fully
    deterministic, so the vocabulary is reproducible on any engine or
    partitioning. Returns (gram, cnt). The top-K is a K-row result via
    orderBy+limit (TakeOrdered — no global sort materialization)."""
    words = docs.select(
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda x: x != "")).alias(
            "w"
        )
    )
    grams = words.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.least(F.lit(int(max_len)), F.length("w"))),
                    lambda n: F.transform(
                        F.sequence(F.lit(1), F.length("w") - n + 1),
                        lambda i: F.col("w").substr(i, n),
                    ),
                )
            )
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(int(vocab_size))
    )


def wordpiece_tokenize(
    docs: DataFrame,
    vocab: DataFrame | list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 4,
) -> DataFrame:
    """Greedy longest-match-first segmentation of every whitespace word
    against ``vocab`` (a (gram, ...) DataFrame — collected driver-side,
    it is K rows — or a plain list). Characters absent from the vocab
    pass through as single-char tokens, so the segmentation always
    covers the word exactly (pinned in tests).

    Output: ``(doc_id, n_words, n_pieces, pieces_md5)`` — one row per
    document; ``pieces_md5`` fingerprints the full piece sequence
    (space-joined) so any two runs/engines producing the same
    segmentation hash identically. Plan: narrow mapInPandas over the
    corpus scan; the vocab set rides the closure (broadcast once per
    executor)."""
    import hashlib

    if isinstance(vocab, DataFrame):
        vocab_set = frozenset(r[0] for r in vocab.select("gram").collect())
    else:
        vocab_set = frozenset(vocab)
    L = int(max_len)

    def fn(batches):
        for pdf in batches:
            out_id, out_nw, out_np, out_md5 = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (text or "").split(" ") if w]
                pieces: list[str] = []
                for w in words:
                    i = 0
                    n = len(w)
                    while i < n:
                        for j in range(min(L, n - i), 0, -1):
                            if j == 1 or w[i : i + j] in vocab_set:
                                pieces.append(w[i : i + j])
                                i += j
                                break
                out_id.append(did)
                out_nw.append(len(words))
                out_np.append(len(pieces))
                out_md5.append(hashlib.md5(" ".join(pieces).encode()).hexdigest())
            import pandas as pd

            yield pd.DataFrame(
                {
                    id_col: out_id,
                    "n_words": out_nw,
                    "n_pieces": out_np,
                    "pieces_md5": out_md5,
                }
            )

    id_t = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        fn, schema=f"{id_col} {id_t}, n_words int, n_pieces int, pieces_md5 string"
    )


def _merge_word(toks: list, left: str, right: str) -> list:
    """Greedy left-to-right non-overlapping merge of the pair
    (left, right) — the reference BPE apply step. Overlaps only arise
    when left == right (runs of the same token): a run of k merges
    floor(k/2) times at offsets 0, 2, 4, … — the parity rule the
    relational oracle reproduces with a gaps-and-islands window."""
    out: list = []
    i, n = 0, len(toks)
    while i < n:
        if i + 1 < n and toks[i] == left and toks[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Byte-pair-encoding MERGE-RULE TRAINING (Sennrich et al. 2016) —
    the tokenizer-training job a 100 TB corpus actually runs, not just
    inference: iteratively merge the globally most frequent adjacent
    token pair, n_merges times, and publish the learned merge table.

    Scale posture — the one property that makes corpus-scale BPE
    tractable: training state is the DISTINCT-WORD table with counts
    (vocabulary-bounded, millions of rows), never corpus positions.
    One corpus pass builds it; every merge round is then (a) one
    pair-count aggregate over the words table (adjacent positions,
    overlaps included — the reference get_stats semantics), (b) a
    1-row TakeOrdered argmax (count desc, pair lexicographic asc —
    fully deterministic), and (c) one Arrow pass applying the greedy
    non-overlapping merge per word. The only driver traffic is the
    1-row merge rule per round (a model parameter, the k-row-collect
    discipline) — the words table itself never leaves the executors;
    ``localCheckpoint`` truncates the 8-round lineage.

    The DuckDB oracle replays every round RELATIONALLY (per-round CTE
    chain: lateral-unnest pair counts → argmax → gaps-and-islands
    parity merge — the ``neardup_kcore`` unrolled-oracle precedent),
    so the Python greedy loop is value-gated against an independent
    windowed-SQL formulation of the same semantics.

    Output: ``(merge_rank, left_tok, right_tok, merged, pair_count)``,
    one row per learned merge in training order.

    Reference: no counterpart (the reference has no text surface);
    beyond-reference LLM-pipeline operator.
    """
    import pandas as pd

    spark = docs.sparkSession
    words = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    state = words.select(
        "word",
        "c",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("toks"),
    ).localCheckpoint()

    rules: list[tuple] = []
    for rank in range(1, int(n_merges) + 1):
        pairs = (
            state.where(F.size("toks") >= 2)
            .select(
                "c",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1),"
                        " i -> struct(element_at(toks, i) AS l,"
                        "             element_at(toks, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .select("c", "p.l", "p.r")
            .groupBy("l", "r")
            .agg(F.sum("c").cast("long").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not best:
            break
        left, right, cnt = best[0].l, best[0].r, int(best[0].cnt)
        rules.append((rank, left, right, left + right, cnt))

        def apply_merge(batches, _l=left, _r=right):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["toks"] = [
                    _merge_word(list(t), _l, _r) for t in pdf["toks"]
                ]
                yield pdf

        state = state.mapInPandas(
            apply_merge, schema="word string, c long, toks array<string>"
        ).localCheckpoint()

    return spark.createDataFrame(
        pd.DataFrame(
            rules,
            columns=["merge_rank", "left_tok", "right_tok", "merged", "pair_count"],
        ),
        schema="merge_rank int, left_tok string, right_tok string,"
        " merged string, pair_count long",
    )


def bpe_train_incremental(
    docs: DataFrame,
    n_merges: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """BPE merge-rule training with INCREMENTAL pair-count maintenance —
    the production form of :func:`bpe_train` (VERDICT r07: at real
    tokenizer merge counts, 32k, the naive per-round full pair
    re-aggregate dominates).

    Invariant exploited: merging (l, r) only changes the adjacent-pair
    multiset of words whose token stream CONTAINS the adjacent pair —
    every other word's pair counts are untouched. So the pair-count
    table is maintained by DELTA: per round, (a) 1-row argmax over the
    maintained counts (the only driver traffic, a model parameter),
    (b) a row-local adjacency predicate splits the word state into
    affected/rest — a narrow scan, NO shuffle, (c) one Arrow pass over
    the AFFECTED words only emits their merged token streams plus
    per-pair count deltas ``(new − old) × word_count``, (d) counts :=
    aggregate(counts ∪ deltas) dropping zeros — a shuffle over the
    pair-vocabulary table, never the corpus. The naive fold's per-round
    explode-all-pairs + global re-aggregate is gone; per-merge cost is
    dominated by the vocabulary-bounded state scan.

    Exactness: the maintained counts equal the full re-aggregate after
    every round (unaffected words contribute identical pairs; affected
    words' deltas are exact integer differences), so the learned merge
    table is IDENTICAL to :func:`bpe_train`'s — pinned by an equality
    test at n_merges=64 and by the same unrolled relational oracle.

    Output: ``(merge_rank, left_tok, right_tok, merged, pair_count)``.
    """
    import pandas as pd

    spark = docs.sparkSession
    words = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    state = words.select(
        "word",
        "c",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("toks"),
    ).localCheckpoint()
    # initial pair counts: the one-and-only full aggregate
    counts = (
        state.where(F.size("toks") >= 2)
        .select(
            "c",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(element_at(toks, i) AS l,"
                    "             element_at(toks, i + 1) AS r))"
                )
            ).alias("p"),
        )
        .select("c", "p.l", "p.r")
        .groupBy("l", "r")
        .agg(F.sum("c").cast("long").alias("cnt"))
        .localCheckpoint()
    )

    rules: list[tuple] = []
    # union(rest, upd) would otherwise ADD partition counts every round
    # (2^R task blow-up, measured); cap the state at its initial width
    n_part = max(1, state.rdd.getNumPartitions())
    delta_schema = (
        "word string, c long, toks array<string>,"
        " deltas array<struct<l: string, r: string, d: long>>"
    )
    for rank in range(1, int(n_merges) + 1):
        best = counts.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not best:
            break
        left, right, cnt = best[0].l, best[0].r, int(best[0].cnt)
        rules.append((rank, left, right, left + right, cnt))

        # row-local adjacency predicate — affected words only. NULL-safe
        # by construction: sequence() would DESCEND for size<2 words
        # (1..0 hits index 0 and throws), so the upper bound is clamped
        # and out-of-range probes use 0-based F.get (NULL, never error),
        # coalesced to false so exists() can't return NULL (a NULL adj
        # would drop the row from BOTH branches).
        adj = F.exists(
            F.sequence(F.lit(1), F.greatest(F.size("toks") - 1, F.lit(1))),
            lambda i: F.coalesce(
                (F.get(F.col("toks"), i - 1) == F.lit(left))
                & (F.get(F.col("toks"), i) == F.lit(right)),
                F.lit(False),
            ),
        )
        affected = state.where(adj)
        rest = state.where(~adj)

        def apply_and_delta(batches, _l=left, _r=right):
            from collections import Counter

            for pdf in batches:
                out_w, out_c, out_t, out_d = [], [], [], []
                for w, c, toks in zip(pdf["word"], pdf["c"], pdf["toks"]):
                    toks = list(toks)
                    nt = _merge_word(toks, _l, _r)
                    old = Counter(zip(toks, toks[1:]))
                    new = Counter(zip(nt, nt[1:]))
                    ds = []
                    for pair in old.keys() | new.keys():
                        d = (new.get(pair, 0) - old.get(pair, 0)) * int(c)
                        if d:
                            ds.append(
                                {"l": pair[0], "r": pair[1], "d": int(d)}
                            )
                    out_w.append(w)
                    out_c.append(int(c))
                    out_t.append(nt)
                    out_d.append(ds)
                yield pd.DataFrame(
                    {"word": out_w, "c": out_c, "toks": out_t, "deltas": out_d}
                )

        upd = affected.mapInPandas(
            apply_and_delta, schema=delta_schema
        ).localCheckpoint()
        state = rest.unionByName(upd.select("word", "c", "toks")).coalesce(
            n_part
        )
        # state checkpoint CADENCE, not per round: the union tree's
        # leaves (previous checkpoint + per-round upd checkpoints) are
        # all materialized, and the stacked row-local filters are cheap
        # JVM predicates — one fewer job per merge; depth is bounded by
        # the cadence.
        if rank % 8 == 0:
            state = state.localCheckpoint()
        deltas = upd.select(F.explode("deltas").alias("p")).select(
            "p.l", "p.r", F.col("p.d").alias("cnt")
        )
        counts = (
            counts.unionByName(deltas)
            .groupBy("l", "r")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .where(F.col("cnt") > 0)
            .coalesce(4)  # pair-vocabulary table: keep task count flat
            .localCheckpoint()
        )

    return spark.createDataFrame(
        pd.DataFrame(
            rules,
            columns=["merge_rank", "left_tok", "right_tok", "merged", "pair_count"],
        ),
        schema="merge_rank int, left_tok string, right_tok string,"
        " merged string, pair_count long",
    )


def _select_disjoint_batch(cands: list[tuple], batch: int) -> list[tuple]:
    """Greedy top-B SYMBOL-DISJOINT pair selection from candidates
    already in argmax order (cnt desc, l asc, r asc): a candidate is
    taken iff none of its three symbols {l, r, l+r} appears among any
    already-taken pair's three symbols. Symbol-disjointness is what
    makes the batch ORDER-INDEPENDENT (see bpe_train_batched)."""
    used: set[str] = set()
    picked: list[tuple] = []
    for l, r, cnt in cands:
        if len(picked) == batch:
            break
        syms = {l, r, l + r}
        if syms & used:
            continue
        used |= syms
        picked.append((l, r, int(cnt)))
    return picked


def bpe_train_batched(
    docs: DataFrame,
    n_merges: int = 64,
    batch_size: int = 8,
    text_col: str = "text",
    max_rounds: int | None = None,
) -> DataFrame:
    """BPE training committing up to ``batch_size`` merges per Spark
    round — the job-launch rung above :func:`bpe_train_incremental`
    (VERDICT r08 #4: the sequential fold is per-merge work-optimal but
    still launches one argmax job round-trip PER MERGE; at 32k merges
    that is 32k scheduler round-trips, hours of pure launch overhead at
    ~100 ms each). Batching divides job launches by B: 32k merges at
    B=64 is 500 rounds.

    SEMANTICS (batch-greedy BPE): each round selects the top-B pairs of
    the count table ENTERING the round, in argmax order (count desc,
    pair lexicographic asc), greedily skipping any pair that shares a
    SYMBOL with an earlier selection in the round — where a pair's
    symbols are {left, right, left+right}. Symbol-disjointness makes
    the round's merges provably order-independent: a merge of pair i
    can neither create a site of pair j (the created symbol ``m_i`` is
    not j's left/right) nor destroy one (i's left/right are not j's),
    so the B rewrites commute and one Arrow pass applies them all.

    Relation to the sequential fold: ``batch_size=1`` IS
    :func:`bpe_train_incremental` (equality-pinned in tests). At B>1
    the variant is a documented approximation of sequential BPE — a
    pair FRESHLY CREATED by an earlier merge in the same round (e.g.
    ('th','e') right after ('t','h')) cannot be selected until the next
    round, so a batch may commit a lower-count pair that sequential
    would have deferred below it. This is the standard quality/launch
    trade of production batched tokenizer trainers. The learned-rule
    divergence is NOT just within-round reordering — it compounds
    across rounds (a different round-1 commit changes every later
    count table), and the in-round symbol-disjointness rule itself
    skips pairs sequential BPE would take (('th','e') right after
    ('t','h')). Measured on the sf0.01 corpus (SCALE.md r10
    "Batched-BPE divergence", pinned in tests): at 64 merges, B=8
    learns 35/64 of the sequential rule set, B=64 learns 27/64, while
    B=8 cuts wall 6× — use large B for throwaway/exploratory vocabs
    and B=1 (the exact sequential fold) when tokenizer parity matters.
    The batch semantics themselves are value-gated by an unrolled
    relational oracle (``bpe_train_batched`` gate: per-round top-B
    disjoint selection + sequential in-round parity merges in SQL).

    Pair counts are maintained incrementally exactly as in
    :func:`bpe_train_incremental` (per-round deltas from affected
    words only — affected = contains ANY selected adjacency, a set
    that is selection-invariant within the round by the same
    disjointness argument). Driver traffic per round: one k-row
    candidate fetch (k = max(32, 8·B), re-fetched doubled if the
    disjoint filter exhausts the window — selection stays EXACT).

    Output: ``(merge_rank, left_tok, right_tok, merged, pair_count,
    batch_round)`` — ``merge_rank`` is global commit order,
    ``pair_count`` the selection-time count, ``batch_round`` the
    1-based round that committed the rule. ``max_rounds`` bounds the
    ROUND count (a round that under-fills its batch still consumes a
    round) — the oracle-parity knob: the relational replay unrolls a
    fixed number of rounds.
    """
    import pandas as pd

    if int(batch_size) < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    spark = docs.sparkSession
    words = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    state = words.select(
        "word",
        "c",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("toks"),
    ).localCheckpoint()
    counts = (
        state.where(F.size("toks") >= 2)
        .select(
            "c",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(element_at(toks, i) AS l,"
                    "             element_at(toks, i + 1) AS r))"
                )
            ).alias("p"),
        )
        .select("c", "p.l", "p.r")
        .groupBy("l", "r")
        .agg(F.sum("c").cast("long").alias("cnt"))
        .localCheckpoint()
    )

    n_part = max(1, state.rdd.getNumPartitions())
    rules: list[tuple] = []
    rnd = 0
    while len(rules) < int(n_merges):
        if max_rounds is not None and rnd >= int(max_rounds):
            break
        rnd += 1
        batch = min(int(batch_size), int(n_merges) - len(rules))
        # exact top-B disjoint selection: widen the candidate window
        # until either B pairs are picked or the table is exhausted
        k = max(32, 8 * batch)
        while True:
            cands = [
                (r.l, r.r, int(r.cnt))
                for r in counts.orderBy(
                    F.desc("cnt"), F.asc("l"), F.asc("r")
                ).limit(k).collect()
            ]
            picked = _select_disjoint_batch(cands, batch)
            if len(picked) == batch or len(cands) < k:
                break
            k *= 2
        if not picked:
            break
        for l, r, cnt in picked:
            rules.append((len(rules) + 1, l, r, l + r, cnt, rnd))

        pick_pairs = [(l, r) for l, r, _ in picked]
        # affected iff the word contains ANY selected adjacency — the
        # site sets are selection-invariant within the round (symbol-
        # disjointness), so the pre-round evaluation is exact. Same
        # NULL-safe clamped probe as the sequential fold.
        def _adj_pred(_l, _r):
            # factory, not default-arg capture: F.exists requires a
            # true 1-arg lambda (extra defaulted params read as a
            # 3-arg HOF signature)
            return F.exists(
                F.sequence(F.lit(1), F.greatest(F.size("toks") - 1, F.lit(1))),
                lambda i: F.coalesce(
                    (F.get(F.col("toks"), i - 1) == F.lit(_l))
                    & (F.get(F.col("toks"), i) == F.lit(_r)),
                    F.lit(False),
                ),
            )

        adj = None
        for l, r in pick_pairs:
            one = _adj_pred(l, r)
            adj = one if adj is None else (adj | one)
        affected = state.where(adj)
        rest = state.where(~adj)

        def apply_and_delta(batches, _pairs=tuple(pick_pairs)):
            from collections import Counter

            for pdf in batches:
                out_w, out_c, out_t, out_d = [], [], [], []
                for w, c, toks in zip(pdf["word"], pdf["c"], pdf["toks"]):
                    toks = list(toks)
                    nt = toks
                    for _l, _r in _pairs:
                        nt = _merge_word(nt, _l, _r)
                    old = Counter(zip(toks, toks[1:]))
                    new = Counter(zip(nt, nt[1:]))
                    ds = []
                    for pair in old.keys() | new.keys():
                        d = (new.get(pair, 0) - old.get(pair, 0)) * int(c)
                        if d:
                            ds.append({"l": pair[0], "r": pair[1], "d": int(d)})
                    out_w.append(w)
                    out_c.append(int(c))
                    out_t.append(nt)
                    out_d.append(ds)
                yield pd.DataFrame(
                    {"word": out_w, "c": out_c, "toks": out_t, "deltas": out_d}
                )

        upd = affected.mapInPandas(
            apply_and_delta,
            schema="word string, c long, toks array<string>,"
            " deltas array<struct<l: string, r: string, d: long>>",
        ).localCheckpoint()
        state = rest.unionByName(upd.select("word", "c", "toks")).coalesce(n_part)
        if rnd % 8 == 0:
            state = state.localCheckpoint()
        deltas = upd.select(F.explode("deltas").alias("p")).select(
            "p.l", "p.r", F.col("p.d").alias("cnt")
        )
        counts = (
            counts.unionByName(deltas)
            .groupBy("l", "r")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .where(F.col("cnt") > 0)
            .coalesce(4)
            .localCheckpoint()
        )

    return spark.createDataFrame(
        pd.DataFrame(
            rules,
            columns=[
                "merge_rank", "left_tok", "right_tok", "merged",
                "pair_count", "batch_round",
            ],
        ),
        schema="merge_rank int, left_tok string, right_tok string,"
        " merged string, pair_count long, batch_round int",
    )


def tokenizer_fertility(
    docs: DataFrame,
    merges: DataFrame | list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Tokenizer FERTILITY report per group (r09): tokens-per-word and
    chars-per-token under a learned BPE merge table, aggregated by
    ``group_col`` (source/domain/language) — the standard check that a
    tokenizer trained on one mix doesn't quietly explode sequence
    lengths on another slice (fertility ↑ ⇒ compute ↑ and effective
    context ↓ on that slice).

    Output: ``(group, n_docs, n_words, n_tokens, n_chars, fertility,
    chars_per_token)`` — fertility = Σtokens/Σwords, chars_per_token =
    Σchars/Σtokens (word chars only, whitespace excluded), both 6 dp,
    NULL when the denominator is zero.

    Plan: one :func:`bpe_apply` Arrow pass (rule list rides the
    closure) + one group-keyed aggregate — nothing new moves."""
    applied = bpe_apply(docs, merges, text_col, id_col)
    chars = docs.select(
        id_col,
        F.col(group_col).alias("group"),
        F.length(F.regexp_replace(F.col(text_col), " ", ""))
        .cast("long")
        .alias("_nc"),
    )
    j = applied.join(chars, id_col)
    ratio = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den.cast("double"), 6)
    )
    agg = j.groupBy("group").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("_nc").cast("long").alias("n_chars"),
    )
    return agg.select(
        "group",
        "n_docs",
        "n_words",
        "n_tokens",
        "n_chars",
        ratio(F.col("n_tokens"), F.col("n_words")).alias("fertility"),
        ratio(F.col("n_chars"), F.col("n_tokens")).alias("chars_per_token"),
    )


def bpe_apply(
    docs: DataFrame,
    merges: DataFrame | list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BPE INFERENCE: tokenize every document with a learned merge
    table (:func:`bpe_train`), applying rules in rank order with the
    same greedy non-overlapping apply as training — so a corpus
    tokenized with merges trained on it reproduces the training
    fold's final word states exactly (the oracle exploits this:
    it replays the training chain relationally and reads the final
    state off ``w{R+1}``).

    ``merges`` is the (merge_rank, left_tok, right_tok, …) table —
    collected driver-side (R rows, a model parameter) — or a plain
    list of (rank, left, right) tuples. Plan: one narrow Arrow pass
    over the corpus; the rule list rides the closure. Output:
    ``(doc_id, n_words, n_tokens, tokens_md5)`` — md5 fingerprints
    the space-joined token stream, so engines agreeing on the
    tokenization hash identically (the ``wordpiece_tokenize``
    contract)."""
    import hashlib

    import pandas as pd

    if isinstance(merges, DataFrame):
        rules = [
            (r.merge_rank, r.left_tok, r.right_tok)
            for r in merges.select("merge_rank", "left_tok", "right_tok").collect()
        ]
    else:
        rules = [(r[0], r[1], r[2]) for r in merges]
    rules.sort()

    def fn(batches):
        cache: dict[str, list[str]] = {}

        def tokenize(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                toks = list(w)
                for _, left, right in rules:
                    toks = _merge_word(toks, left, right)
                cache[w] = got = toks
            return got

        for pdf in batches:
            out_id, out_nw, out_nt, out_md5 = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (text or "").split(" ") if w]
                toks: list[str] = []
                for w in words:
                    toks.extend(tokenize(w))
                out_id.append(did)
                out_nw.append(len(words))
                out_nt.append(len(toks))
                out_md5.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: out_id,
                    "n_words": out_nw,
                    "n_tokens": out_nt,
                    "tokens_md5": out_md5,
                }
            )

    id_t = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        fn, schema=f"{id_col} {id_t}, n_words int, n_tokens int, tokens_md5 string"
    )
