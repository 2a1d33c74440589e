"""Property-based differential tests (hypothesis): the custom operators
(as-of join, range join, last-per-group, stale status) vs brute-force
Python reference semantics on randomized inputs — beyond the reference's
example-based suite (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (user, time, value) with small domains to force group/time collisions
rows_st = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 20),
        st.integers(-100, 100),
    ),
    min_size=0,
    max_size=30,
)


@given(left=rows_st, right=rows_st)
@SET
def test_asof_join_matches_bruteforce(spark, left, right):
    from waddleml_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame(
        [(i, u, t) for i, (u, t, _) in enumerate(left)], "lid long, u long, t long"
    )
    rdf = spark.createDataFrame(
        [(u, t, v) for u, t, v in right], "u long, t long, v long"
    )
    got = {
        (r.lid, r.t_asof, r.v_asof)
        for r in asof_join(
            ldf, rdf, on=["u"], left_time="t", right_time="t",
            right_values=["v"], how="inner",
        ).collect()
    }
    # brute force: greatest right t' <= t per group (value at a tied t' is
    # whichever row the window saw last — not deterministic — so values are
    # only compared below when (u, t') is unique; times always are)
    best: dict[tuple[int, int], int] = {}
    for u, t, v in right:
        best[(u, t)] = max(v for (uu, tt, v) in right if uu == u and tt == t)
    want = set()
    for i, (u, t, _) in enumerate(left):
        cand = [(tt, best[(uu, tt)]) for (uu, tt) in best if uu == u and tt <= t]
        if cand:
            tmax = max(tt for tt, _ in cand)
            want.add((i, tmax, best[(u, tmax)]))
    # compare on (lid, matched time); values compared only when the right
    # side has a unique row at that (u, t)
    assert {(lid, t) for lid, t, _ in got} == {(lid, t) for lid, t, _ in want}


@given(rows=rows_st)
@SET
def test_last_per_group_matches_bruteforce(spark, rows):
    from waddleml_spark.operators.core import last_per_group

    df = spark.createDataFrame(
        [(u, t, v, i) for i, (u, t, v) in enumerate(rows)],
        "u long, t long, v long, rid long",
    )
    got = {(r.u, r.t) for r in last_per_group(df, ["u"], "t", keep_ties=True).collect()}
    want = set()
    groups: dict[int, list[tuple[int, int]]] = {}
    for u, t, v in rows:
        groups.setdefault(u, []).append((t, v))
    for u, tv in groups.items():
        tmax = max(t for t, _ in tv)
        want.add((u, tmax))
    assert got == want
    # rank() keeps ALL max-t rows (ref J2 equality-on-MAX semantics)
    got_rows = last_per_group(df, ["u"], "t", keep_ties=True).count()
    want_rows = sum(
        sum(1 for t, _ in tv if t == max(x for x, _ in tv)) for tv in groups.values()
    )
    assert got_rows == want_rows


@given(rows=rows_st, dist=st.integers(0, 10))
@SET
def test_range_join_matches_bruteforce(spark, rows, dist):
    from waddleml_spark.operators.temporal import range_join_bucketized

    df1 = spark.createDataFrame(
        [(u, i, float(t)) for i, (u, t, _) in enumerate(rows)],
        "u long, id1 long, t1 double",
    )
    df2 = spark.createDataFrame(
        [(u, i, float(t)) for i, (u, t, _) in enumerate(rows)],
        "u long, id2 long, t2 double",
    )
    if dist == 0:
        dist = 1
    got = {
        (r.id1, r.id2)
        for r in range_join_bucketized(
            df1, df2, on=["u"], left_val="t1", right_val="t2", max_distance=float(dist)
        ).collect()
    }
    want = {
        (i, j)
        for i, (u1, t1, _) in enumerate(rows)
        for j, (u2, t2, _) in enumerate(rows)
        if u1 == u2 and abs(t1 - t2) <= dist
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=0, max_size=20
    ),
    threshold=st.integers(1, 500),
)
@SET
def test_stale_status_matches_bruteforce(spark, rows, threshold):
    from waddleml_spark.operators.core import stale_status

    now = 2000.0
    run_ids = sorted({u for u, _ in rows} | {99})  # 99 has no metrics
    runs = spark.createDataFrame(
        [(str(u), "running", 0.0) for u in run_ids],
        "id string, status string, started_at double",
    )
    metrics = spark.createDataFrame(
        [(str(u), float(t)) for u, t in rows], "run_id string, ts double"
    )
    got = {
        (r.id, r.status)
        for r in stale_status(runs, metrics, now_ts=now, threshold_s=float(threshold)).collect()
    }
    want = set()
    for u in run_ids:
        ts = [t for uu, t in rows if uu == u]
        last = max(ts) if ts else 0.0  # falls back to started_at=0
        want.add((str(u), "aborted" if last < now - threshold else "running"))
    assert got == want


# random "documents": token counts realized as space-joined synthetic words
docs_st = st.lists(
    st.integers(0, 140),  # token count per doc (covers < chunk, = chunk, > chunk)
    min_size=1,
    max_size=12,
)


@SET
@given(counts=docs_st)
def test_chunk_count_matches_analytic_formula(spark, counts):
    """chunk_tokens materializes exactly
    1 + floor((max(n-overlap,1)-1)/stride) chunks per non-empty doc —
    the closed form the SQL oracle uses."""
    from waddleml_spark.llmops.packing import chunk_tokens

    rows = [(i, " ".join(["ab"] * n)) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_tokens(df, chunk=64, overlap=16)
    got = {r["id"]: r["cnt"] for r in out.groupBy("id").agg(F.count("*").alias("cnt")).collect()}
    for i, n in enumerate(counts):
        if n == 0:
            assert i not in got
        else:
            expect = 1 + (max(n - 16, 1) - 1) // 48
            assert got[i] == expect, (n, got[i], expect)


@SET
@given(counts=docs_st, seq_len=st.integers(8, 64))
def test_packed_sequences_layout_invariants(spark, counts, seq_len):
    """Packing invariants hold for arbitrary token counts and seq_len:
    gapless tape, conserved totals, correct first/last sequence ids."""
    from waddleml_spark.llmops.packing import packed_sequences

    # letter-only words: one BPE token each (digits would split in two)
    rows = [(i, " ".join(["ab"] * n)) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    plan = sorted(packed_sequences(df, seq_len=seq_len).collect(), key=lambda r: r.start)
    nonzero = [n for n in counts if n > 0]
    assert len(plan) == len(nonzero)
    if not plan:
        return
    assert plan[0].start == 0
    for a, b in zip(plan, plan[1:]):
        assert b.start == a.end
    assert plan[-1].end == sum(nonzero)
    for r in plan:
        assert r.first_seq == r.start // seq_len
        assert r.last_seq == (r.end - 1) // seq_len


def test_resample_interpolate_hand_series(spark):
    """Hand-checkable grid: points (t=90,v=10) (t=210,v=40) (t=300,v=40),
    step=60 → grid 120,180,240,300 with linear values between neighbors."""
    from waddleml_spark.operators.temporal import resample_interpolate

    rows = [(1, 90.0, 10.0), (1, 210.0, 40.0), (1, 300.0, 40.0)]
    df = spark.createDataFrame(rows, "k int, ts double, v double")
    out = {
        r.grid_ts: r.value_interp
        for r in resample_interpolate(df, "k", "ts", "v", 60).collect()
    }
    assert out[120.0] == 10.0 + 30.0 * (120 - 90) / (210 - 90)   # 17.5
    assert out[180.0] == 10.0 + 30.0 * (180 - 90) / (210 - 90)   # 32.5
    assert out[240.0] == 40.0 + 0.0 * (240 - 210) / (300 - 210)  # 40.0
    assert out[300.0] == 40.0  # exact hit on a real point
    assert set(out) == {120.0, 180.0, 240.0, 300.0}


# word pools for document-shaped properties: small vocab forces chunk and
# rule-threshold collisions
_words_st = st.lists(
    st.sampled_from(["the", "a", "cat", "table", "12", "zz", "query", "spark"]),
    min_size=0,
    max_size=60,
)
_docs_st = st.lists(_words_st, min_size=1, max_size=8)


@given(docs=_docs_st)
@SET
def test_passage_dup_report_matches_bruteforce(spark, docs):
    import hashlib
    from collections import defaultdict

    from waddleml_spark.llmops import dedup

    rows = [
        (i, "src" + str(i % 2), " ".join(ws)) for i, ws in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.source: (r.total_passages, r.dup_passages, r.docs_affected)
        for r in dedup.passage_dup_report(df).collect()
    }
    # brute force in Python: split like the operator does (empty text -> [''])
    holders: dict[str, set[int]] = defaultdict(set)
    inst: list[tuple[int, str, str]] = []
    for i, src, text in rows:
        ws = text.split() if text.strip() else [""]
        chunks = [ws[j : j + 20] for j in range(0, max(len(ws), 1), 20)]
        for ch in chunks:
            h = hashlib.md5(" ".join(ch).encode()).hexdigest()
            holders[h].add(i)
            inst.append((i, src, h))
    want: dict[str, list[int]] = {}
    for src in {s for _, s, _ in inst}:
        mine = [(i, h) for i, s, h in inst if s == src]
        dup = [(i, h) for i, h in mine if len(holders[h]) >= 2]
        want[src] = (len(mine), len(dup), len({i for i, _ in dup}))
    assert got == want


@given(docs=_docs_st)
@SET
def test_gopher_flags_match_bruteforce(spark, docs):
    from waddleml_spark.llmops import textstats

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (
            r.fail_word_count,
            r.fail_mean_word_len,
            r.fail_stopwords,
            r.fail_alpha_ratio,
            r.fail_ttr,
        )
        for r in textstats.gopher_flags(df).collect()
    }
    import re

    stop = set(textstats.GOPHER_STOPWORDS)
    for i, text in rows:
        ws = re.findall(r"[a-z0-9]+", text.lower())
        n = len(ws)
        mean_len = sum(map(len, ws)) / n if n else None
        alpha = sum(1 for w in ws if re.search(r"[a-z]", w))
        stops = sum(1 for w in ws if w in stop)
        ttr = len(set(ws)) / n if n else None
        want = (
            0 if 50 <= n <= 100000 else 1,
            0 if n and 3.0 <= mean_len <= 10.0 else 1,
            0 if stops >= 2 else 1,
            0 if n and alpha / n >= 0.8 else 1,
            0 if n and ttr >= 0.3 else 1,
        )
        assert got[i] == want, (i, text, got[i], want)


# arbitrary text incl. the whitespace-adjacent control chars where Java
# and RE2 shorthand classes historically diverge (\x0b was a real latent
# driver red; \x85 NEL, \xa0 NBSP,   LS are the next candidates)
text_st = st.lists(
    st.text(
        alphabet=(
            "ab z09.,!?-_'\"\t\n\r\f\x0b\x1c\x1d\x1e\x1f\x85\xa0 　"
        ),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@SET
@given(texts=text_st)
def test_tokenizer_parity_spark_vs_duckdb_on_arbitrary_text(spark, texts):
    # the EXACT expression pairing every text oracle uses: Spark
    # split(regexp_replace(lower_trim(t), WS_RE, ' '), ' ') must equal
    # DuckDB str_split_regex(regexp_replace(lower(t), WS_TRIM_RE, '', 'g'),
    # WS_RE) for ANY input, and the BPE_RE extract-all must agree too.
    # This fuzz found BOTH real divergences: \x0b in the `\s` class and
    # NBSP in the engines' trim builtins (Spark strips only 0x20, DuckDB
    # strips Unicode Zs) — hence the explicit-class lower_trim pairing
    import duckdb

    from waddleml_spark.llmops import WS_RE, WS_TRIM_RE
    from waddleml_spark.llmops.textstats import BPE_RE, lower_trim

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r.i: (r.ws, r.bpe)
        for r in df.select(
            "i",
            F.split(
                F.regexp_replace(lower_trim(F.col("t")), WS_RE, " "), " "
            ).alias("ws"),
            F.regexp_extract_all(F.col("t"), F.lit(BPE_RE), F.lit(0)).alias("bpe"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        ws, bpe = con.execute(
            f"SELECT str_split_regex(regexp_replace(lower(?), '{WS_TRIM_RE}', '', 'g'), '{WS_RE}'),"
            f"       regexp_extract_all(?, '{BPE_RE}')",
            [t, t],
        ).fetchone()
        assert got[i][0] == ws, (repr(t), got[i][0], ws)
        assert got[i][1] == bpe, (repr(t), got[i][1], bpe)


@SET
@given(texts=text_st)
def test_tokens_sql_matches_column_tokenizer(spark, texts):
    # the parsed expr-string tokenizer (llmops.tokens_sql, round 7 —
    # used by the expr-built minhash pipeline) must be token-identical
    # to the Column-API split(lower_trim, WS_RE) on ANY input: sql_str's
    # backslash doubling and the SQL parser's escape processing are the
    # two places a regex literal could silently diverge between paths
    from waddleml_spark.llmops import WS_RE, tokens_sql
    from waddleml_spark.llmops.textstats import lower_trim

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    )
    both = df.select(
        "i",
        F.split(lower_trim(F.col("t")), WS_RE).alias("col_api"),
        F.expr(tokens_sql("t")).alias("parsed"),
    ).collect()
    for r in both:
        assert r.col_api == r.parsed, (r.i, texts[r.i], r.col_api, r.parsed)


@SET
@given(
    pairs=st.lists(
        st.tuples(
            st.text(alphabet="ab cde-0.!\t\n\xe9\xfc", max_size=25),
            st.text(alphabet="ab cde-0.!\t\n\xe9\xfc", max_size=25),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_scalar_expression_parity_spark_vs_duckdb(spark, pairs):
    # the other oracle-paired scalar families: levenshtein (claimed
    # 'identical classic DP semantics'), the Gopher stopword
    # word-boundary count (Java \b vs RE2 \b), and the hash functions —
    # fuzzed the same way the tokenizer pairing was
    import duckdb

    # levenshtein and the \b stopword count are compared on ASCII
    # projections of the inputs — BOTH pairings are sound only on ASCII
    # (fuzz-found): DuckDB's levenshtein counts UTF-8 BYTES while
    # Spark's counts characters (lev('', 'é') = 2 vs 1), and Java's \b
    # is Unicode-aware while RE2's is ASCII ('aé' has a boundary after
    # 'a' for RE2 but not Java).  The synthetic corpus is pure ASCII and
    # test_dedup_units pins that assumption as a canary
    rows = [
        (
            i,
            a,
            b,
            a.encode("ascii", "replace").decode(),
            b.encode("ascii", "replace").decode(),
        )
        for i, (a, b) in enumerate(pairs)
    ]
    df = spark.createDataFrame(rows, "i int, a string, b string, aa string, ba string")
    sw = r"\b(the|a|of|to|and|in)\b"
    got = {
        r.i: (r.lev, r.sw, r.md5, r.sha)
        for r in df.select(
            "i",
            F.levenshtein("aa", "ba").alias("lev"),
            F.size(
                F.regexp_extract_all(F.lower("aa"), F.lit(sw), F.lit(0))
            ).alias("sw"),
            F.md5(F.col("a").cast("binary")).alias("md5"),
            F.sha2(F.col("a").cast("binary"), 256).alias("sha"),
        ).collect()
    }
    con = duckdb.connect()
    for i, a, b, aa, ba in rows:
        lev, swn, m5, sha = con.execute(
            "SELECT levenshtein(?, ?),"
            f"      len(regexp_extract_all(lower(?), '{sw}')),"
            "       md5(?), sha256(?)",
            [aa, ba, aa, a, a],
        ).fetchone()
        assert got[i] == (lev, swn, m5, sha), (repr(a), repr(b), got[i], (lev, swn, m5, sha))


json_st = st.lists(
    st.one_of(
        # well-formed objects with int/str/nested k
        st.integers(-5, 5).map(lambda v: f'{{"k": {v}}}'),
        st.integers(0, 9).map(lambda v: f'{{"k": "{v}"}}'),
        st.just('{"k": {"x": 1}}'),
        st.just('{"other": 3}'),
        # the tolerant-parse surface: malformed / edge inputs
        st.just(""), st.just("null"), st.just("{"), st.just("not json"),
        st.just('{"k": }'), st.just('{"k": null}'), st.just("[1,2]"),
        st.just('{"k": 007}'), st.just('{"k": 1e2}'), st.just('{"k": true}'),
        # Java-only numeric literals — the strict _NUM_RE gate must NULL
        # them on BOTH sides (Spark's cast would accept them; floor(NaN)
        # even yields 0, not NULL)
        st.just('{"k": "nan"}'), st.just('{"k": "5d"}'),
        st.just('{"k": "0x1p3"}'), st.just('{"k": "1.5D"}'),
        st.just('{"k": "Infinity"}'),
        # lenient-prefix shapes: Spark's Jackson extracts, DuckDB's
        # json_valid rejects — the KNOWN residual divergence
        st.just('{"k": 1} x'), st.just('{"k": 1}}'), st.just("{'k':4}"),
        st.text(alphabet='{}[]":k123, ', max_size=12),
    ),
    min_size=1,
    max_size=12,
)


@SET
@given(docs=json_st)
def test_tolerant_json_parity_spark_vs_duckdb(spark, docs):
    # the F2 pairing (the EXACT production expressions): tolerant on
    # both sides, strict-numeric-gated, with ONE documented residual
    # divergence — Spark's Jackson accepts a valid JSON PREFIX plus
    # trailing garbage where DuckDB's json_valid rejects the document.
    # Contract asserted here: engines AGREE whenever the document is
    # valid JSON; on invalid documents DuckDB is NULL and Spark may
    # leniently extract (never the reverse)
    import duckdb

    from waddleml_spark.catalog import _NUM_RE

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "i int, t string"
    )
    raw = F.get_json_object("t", "$.k")
    got = {
        r.i: r.k
        for r in df.select(
            "i",
            F.floor(F.when(raw.rlike(_NUM_RE), raw).try_cast("double"))
            .try_cast("int")
            .alias("k"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(docs):
        valid, k = con.execute(
            "SELECT json_valid(?::VARCHAR),"
            "       CASE WHEN json_valid(?::VARCHAR)"
            f"            AND regexp_matches(json_extract_string(?::VARCHAR, '$.k'), '{_NUM_RE}')"
            "       THEN TRY_CAST("
            "         floor(TRY_CAST(json_extract_string(?::VARCHAR, '$.k') AS DOUBLE))"
            "         AS INTEGER) END",
            [t, t, t, t],
        ).fetchone()
        if valid:
            assert got[i] == k, (repr(t), got[i], k)
        else:
            assert k is None, (repr(t), k)  # never the reverse


@SET
@given(
    vals=st.lists(
        st.one_of(
            st.floats(-1e12, 1e12),
            st.floats(-1e6, 1e6),
            st.sampled_from([0.0, -0.0, 0.5, -0.5, 0.1234565, 2.675, 1e-300]),
        ),
        min_size=1,
        max_size=15,
    ),
    digits=st.integers(0, 6),
)
def test_floor_round_formula_parity_spark_vs_duckdb(spark, vals, digits):
    # the _r/_r_sql pairing every float oracle leans on: identical IEEE
    # op sequence floor(x*10^d + 0.5)/10^d must produce bit-identical
    # doubles in both engines within the documented soundness domain —
    # FINITE and |x*10^d| < 2^63 (the fuzz found both boundaries:
    # Spark's floor returns BIGINT so it clamps beyond long range AND
    # maps NaN to 0, DuckDB's stays double — see _r's docstring;
    # 1e12 * 10^6 stays inside)
    import math

    import duckdb

    from waddleml_spark.catalog import _r, _r_nan, _r_sql

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i int, v double"
    )
    got = {r.i: r.rv for r in df.select("i", _r(F.col("v"), digits).alias("rv")).collect()}
    con = duckdb.connect()
    for i, v in enumerate(vals):
        (rv,) = con.execute(
            f"SELECT {_r_sql('?::DOUBLE', digits)}", [float(v)]
        ).fetchone()
        assert got[i] == rv, (v, digits, got[i], rv)


def test_r_nan_divergence_pinned_and_r_nan_agrees(spark):
    # OUTSIDE the soundness domain the plain pairing is KNOWN-divergent:
    # Spark _r(NaN) = 0.0 (floor's BIGINT path) vs DuckDB nan.  Pin that
    # reality, and verify _r_nan/_r_nan_sql restore agreement (NaN out
    # on both engines) — the variant embedding_neardup_pairs uses
    import math

    import duckdb

    from waddleml_spark.catalog import _r, _r_nan, _r_nan_sql, _r_sql

    nan = float("nan")
    df = spark.createDataFrame([(nan,)], "v double")
    plain, safe = df.select(
        _r(F.col("v"), 6).alias("p"), _r_nan(F.col("v"), 6).alias("s")
    ).collect()[0]
    assert plain == 0.0  # the divergence (documented in _r's docstring)
    assert math.isnan(safe)
    nan_expr = "'nan'::DOUBLE"
    dp, ds = duckdb.sql(
        f"SELECT {_r_sql(nan_expr, 6)}, {_r_nan_sql(nan_expr, 6)}"
    ).fetchone()
    assert math.isnan(dp) and math.isnan(ds)  # duck keeps NaN either way


@SET
@given(
    epochs=st.lists(
        st.integers(0, 4_102_444_800),  # 1970..2100, second grain
        min_size=1,
        max_size=15,
    )
)
def test_temporal_truncation_parity_spark_vs_duckdb(spark, epochs):
    # the pairing the events/orders calendar oracles use: date_trunc +
    # strftime/date_format + year/hour extraction must agree for any
    # UTC timestamp (read_table pins UTC; both sessions run UTC)
    import duckdb

    df = spark.createDataFrame(
        [(i, e) for i, e in enumerate(epochs)], "i int, e long"
    )
    ts = F.timestamp_seconds(F.col("e"))
    got = {
        r.i: (r.day, r.month, r.yr, r.hr)
        for r in df.select(
            "i",
            F.date_format(F.date_trunc("day", ts), "yyyy-MM-dd").alias("day"),
            F.date_format(F.date_trunc("month", ts), "yyyy-MM").alias("month"),
            F.year(ts).alias("yr"),
            F.hour(ts).alias("hr"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for i, e in enumerate(epochs):
        row = con.execute(
            "SELECT strftime(date_trunc('day', to_timestamp(?)), '%Y-%m-%d'),"
            "       strftime(date_trunc('month', to_timestamp(?)), '%Y-%m'),"
            "       CAST(year(to_timestamp(?)) AS INTEGER),"
            "       CAST(hour(to_timestamp(?)) AS INTEGER)",
            [e, e, e, e],
        ).fetchone()
        assert got[i] == row, (e, got[i], row)


@SET
@given(
    toks=st.lists(
        st.text(alphabet="abcdef tuvxyz0189-_.é", min_size=0, max_size=20),
        min_size=1,
        max_size=15,
    )
)
def test_md5_hash32_parity_spark_vs_duckdb(spark, toks):
    # the MinHash/SimHash oracle core: Spark conv(substring(md5,1,8),16,10)
    # must equal DuckDB's md5_number_upper byte swizzle for ANY token
    # (md5 is byte-identical across engines — UTF-8 in, hex out — so
    # this pins the base-16 conv and the endianness reassembly)
    import duckdb

    df = spark.createDataFrame([(i, t) for i, t in enumerate(toks)], "i int, t string")
    got = {
        r.i: r.h
        for r in df.select(
            "i",
            F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long").alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(toks):
        (h,) = con.execute(
            "SELECT CAST(((md5_number_upper(?) & 255) * 16777216)"
            "     + (((md5_number_upper(?) >> 8) & 255) * 65536)"
            "     + (((md5_number_upper(?) >> 16) & 255) * 256)"
            "     + ((md5_number_upper(?) >> 24) & 255) AS BIGINT)",
            [t, t, t, t],
        ).fetchone()
        assert got[i] == h, (repr(t), got[i], h)


@SET
@given(
    vals=st.lists(
        st.one_of(
            st.floats(0, 1e6),
            st.sampled_from([0.125, 0.25, 59.995, 59.994, 0.005, 12.345, 2.675]),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_duration_format_parity_spark_vs_duckdb(spark, vals):
    # the F6 humanize pairing: %.2f formatting after the _r2 floor
    # pre-round.  Java's format rounds HALF_UP while C printf rounds
    # half-even — the pre-round makes the formatted digit unambiguous
    # (n/100's nearest double is never an exact half at the cut), which
    # this fuzz pins including the classic 2.675/0.125 trap values
    import duckdb

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i int, v double"
    )
    r2 = F.floor(F.col("v") * 100 + F.lit(0.5)) / 100
    expr = F.when(F.col("v") < 60, F.format_string("%.2fs", r2)).otherwise(
        F.format_string("%.2fm", F.floor(F.col("v") / 60 * 100 + F.lit(0.5)) / 100)
    )
    got = {r.i: r.d for r in df.select("i", expr.alias("d")).collect()}
    con = duckdb.connect()
    for i, v in enumerate(vals):
        (d,) = con.execute(
            "SELECT CASE WHEN ? < 60"
            "  THEN printf('%.2fs', floor(? * 100 + 0.5) / 100)"
            "  ELSE printf('%.2fm', floor(? / 60 * 100 + 0.5) / 100) END",
            [float(v)] * 3,
        ).fetchone()
        assert got[i] == d, (v, got[i], d)
