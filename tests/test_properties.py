"""Property-based checks (SURVEY.md §5.4) — the invariants that hold for
ANY input, where a fixed oracle would under-test: aggregation is
partition-invariant, dedup is idempotent, melt∘pivot round-trips, exact
and hash dedup agree. Few examples, small frames — each example runs a
real Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from etl_io_spark.operators import dedup, reshape

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.sampled_from(["a", "b", "c"]),  # category
        st.integers(min_value=-100, max_value=100),  # value (int: exact sums)
    ),
    min_size=1,
    max_size=30,
)

texts_strategy = st.lists(
    st.text(
        alphabet="ab c", min_size=0, max_size=20
    ),  # tiny alphabet → collisions likely → dedup actually fires
    min_size=1,
    max_size=12,
)


@given(rows=rows_strategy)
@_settings
def test_groupby_sum_invariant_under_repartition(spark, rows):
    df = spark.createDataFrame(rows, "k int, c string, v long")
    base = {(r["k"], r["s"]) for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    for parts in (1, 7):
        re = {
            (r["k"], r["s"])
            for r in df.repartition(parts)
            .groupBy("k")
            .agg(F.sum("v").alias("s"))
            .collect()
        }
        assert re == base


@given(texts=texts_strategy)
@_settings
def test_exact_dedup_idempotent_and_hash_agrees(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    once = dedup.exact_dedup(df, "id", "text")
    keep = once.select(F.col("keep_id").alias("id")).join(df, "id")
    twice = dedup.exact_dedup(keep, "id", "text")
    assert once.count() == twice.count()
    assert (twice.agg(F.sum("n_dups")).first()[0] or 0) == twice.count()
    by_hash = dedup.exact_dedup(df, "id", "text", by_hash=True)
    assert sorted(r["keep_id"] for r in once.collect()) == sorted(
        r["keep_id"] for r in by_hash.collect()
    )


@given(rows=rows_strategy)
@_settings
def test_melt_of_fused_pivot_recovers_sums(spark, rows):
    df = spark.createDataFrame(rows, "k int, c string, v long")
    wide = reshape.pivot_wide(
        df,
        index="k",
        pivot_col="c",
        value_col="v",
        values=["a", "b", "c"],
        agg_fn=F.sum,
    )
    melted = wide.unpivot("k", ["a", "b", "c"], "c", "v").where(
        F.col("v").isNotNull()
    )
    base = {
        (r["k"], r["c"], r["s"])
        for r in df.groupBy("k", "c").agg(F.sum("v").alias("s")).collect()
    }
    got = {(r["k"], r["c"], r["v"]) for r in melted.collect()}
    assert got == base


chunk_params = st.tuples(
    st.integers(min_value=2, max_value=12),   # chunk_tokens
    st.integers(min_value=0, max_value=11),   # overlap (< chunk_tokens)
).filter(lambda p: p[1] < p[0])

doc_lengths = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=8
)


@given(params=chunk_params, lengths=doc_lengths)
@_settings
def test_chunking_covers_every_token_once(spark, params, lengths):
    """For any (chunk, overlap) and doc sizes: chunk 0 plus the new tokens
    of each later chunk reconstruct the document exactly — nothing lost,
    nothing double-counted, chunk indexes consecutive from 0."""
    from etl_io_spark.operators import training

    chunk_tokens, overlap = params
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(n))) for i, n in enumerate(lengths)
    ]
    df = spark.createDataFrame(rows, ["id", "txt"])
    out = training.chunk_documents(
        df, "id", "txt", chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    for i, n in enumerate(lengths):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_index"])
        if n == 0:
            assert chunks == []
            continue
        assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
        # reconstruct: chunk 0 whole, then the non-overlapped tail of each
        toks = chunks[0]["chunk_text"].split(" ")
        for c in chunks[1:]:
            toks.extend(c["chunk_text"].split(" ")[overlap:])
        assert toks == [f"t{i}_{j}" for j in range(n)]


@given(lengths=doc_lengths)
@_settings
def test_packing_partitions_docs_exactly(spark, lengths):
    """pack_sequences assigns every doc to exactly one bin and tok_start
    equals the running sum of earlier docs in its shard."""
    from etl_io_spark.operators import training

    rows = [
        (i, " ".join("w" for _ in range(n))) for i, n in enumerate(lengths)
    ]
    df = spark.createDataFrame(rows, ["id", "txt"])
    out = training.pack_sequences(df, "id", "txt", ctx_tokens=7, n_shards=2)
    got = out.collect()
    assert len(got) == len(lengths)
    by_shard: dict[int, list] = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["tok_start"])
        running = 0
        for r in shard_rows:
            assert r["tok_start"] == running
            running += r["n_tokens"]


money_rows_strategy = st.lists(
    st.tuples(
        # 2-decimal prices/discounts stored as doubles, the driver
        # fixture domain: the property is that _money_e4 recovers the
        # TRUE 4-decimal product exactly for every such pair
        st.integers(min_value=0, max_value=10_499_991),  # price cents
        st.integers(min_value=0, max_value=10),  # discount in percent
    ),
    min_size=1,
    max_size=25,
)


@given(rows=money_rows_strategy)
@_settings
def test_money_e4_sum_is_decimal_exact_and_order_free(spark, rows):
    """pipelines._money_e4 must equal exact decimal arithmetic
    (sum of price*(1-disc) in 1e-4 units) for every 2-decimal input,
    and the sum must be invariant under repartitioning — the property
    the integer-exact money discipline rests on."""
    from decimal import Decimal

    from etl_io_spark.plans.pipelines import _money_e4

    data = [(c / 100.0, d / 100.0) for c, d in rows]
    expected = sum(
        (Decimal(c) * Decimal(100 - d) for c, d in rows), Decimal(0)
    )  # cents * pct == 1e-4 units
    df = spark.createDataFrame(data, "l_extendedprice double, l_discount double")
    for parts in (1, 5):
        got = (
            df.repartition(parts)
            .agg(F.sum(_money_e4(1 - F.col("l_discount"))).alias("s"))
            .collect()[0]["s"]
        )
        assert got == int(expected)


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ),
    min_size=1,
    max_size=20,
)


@given(edges=edges_strategy)
@_settings
def test_connected_components_driver_path_matches_loop(spark, edges):
    """The driver union-find fast path and the distributed
    pointer-jumping loop must produce IDENTICAL (id, cluster_id)
    labelings on arbitrary graphs — self-loops, duplicate and
    reversed edges included — not just the pinned chain/star/cycle
    fixtures."""
    from etl_io_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "a long, b long")
    fast = {
        (r["id"], r["cluster_id"])
        for r in connected_components(df, "a", "b").collect()
    }
    slow = {
        (r["id"], r["cluster_id"])
        for r in connected_components(
            df, "a", "b", max_driver_edges=0
        ).collect()
    }
    assert fast == slow


asof_strategy = st.tuples(
    st.lists(  # left: (key, minute)
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=120),
        ),
        min_size=1,
        max_size=15,
    ),
    st.lists(  # right: (key, minute, value)
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=120),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=15,
    ),
)


@given(data=asof_strategy)
@_settings
def test_asof_join_matches_pandas_merge_asof(spark, data):
    """All three directions against pandas merge_asof — an INDEPENDENT
    reference implementation of the same contract — on arbitrary keyed
    event sets (duplicate timestamps collapse to max value first, since
    merge_asof's intra-ts tiebreak is positional, not defined)."""
    import datetime as _dt

    import pandas as pd

    from etl_io_spark.operators import joins

    left_rows, right_rows = data
    t0 = _dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + _dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        sorted({(k, ts(m)) for k, m in left_rows}), "k int, ts timestamp"
    )
    rmax: dict = {}
    for k, m, v in right_rows:
        key = (k, ts(m))
        rmax[key] = max(rmax.get(key, float(v)), float(v))
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in sorted(rmax.items())],
        "k int, ts timestamp, v double",
    )
    lpdf = left.toPandas().sort_values("ts", kind="stable")
    rpdf = right.toPandas().sort_values("ts", kind="stable")
    for direction in ("backward", "forward", "nearest"):
        got = {
            (r["k"], r["ts"]): r["v_asof"]
            for r in joins.asof_join(
                left, right, on="k", right_cols=["v"], direction=direction
            ).collect()
        }
        ref_df = pd.merge_asof(
            lpdf, rpdf, on="ts", by="k", direction=direction
        )
        ref = {
            (r.k, r.ts.to_pydatetime()): (None if pd.isna(r.v) else r.v)
            for r in ref_df.itertuples()
        }
        assert got == ref, direction


wp_strategy = st.lists(
    st.tuples(
        st.sampled_from(["g", "h"]),
        st.integers(min_value=0, max_value=20),  # value
        st.integers(min_value=1, max_value=9),  # weight
    ),
    min_size=1,
    max_size=25,
)


@given(rows=wp_strategy)
@_settings
def test_weighted_percentiles_match_bruteforce(spark, rows):
    """The windowed plan must equal the definition computed directly:
    smallest value whose cumulative weight over sorted values reaches
    q x total weight."""
    from etl_io_spark.operators import aggregate as agg

    df = spark.createDataFrame(
        [(g, float(v), w) for g, v, w in rows], "g string, v double, w int"
    )
    qs = (0.25, 0.5, 0.9)
    got = {
        r["g"]: (r["wp25"], r["wp50"], r["wp90"])
        for r in agg.weighted_percentiles(df, ["g"], "v", "w", qs).collect()
    }
    by_g: dict = {}
    for g, v, w in rows:
        by_g.setdefault(g, {})
        by_g[g][v] = by_g[g].get(v, 0) + w
    want = {}
    for g, wmap in by_g.items():
        tot = sum(wmap.values())
        picks = []
        for q in qs:
            cum = 0
            for v in sorted(wmap):
                cum += wmap[v]
                if cum >= q * tot:
                    picks.append(float(v))
                    break
        want[g] = tuple(picks)
    assert got == want
