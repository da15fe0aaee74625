"""Training-data pipeline operators (north-star extension).

The ops a large-scale LLM-data pipeline runs after dedup/quality filtering
(no analogue in the reference — `/root/reference/etl_io.py` stops at
tabulation; these extend the engine the way its TODO at etl_io.py:947
gestures toward data-products):

  * ``split_assign``      — deterministic hash train/val/test assignment.
  * ``stratified_sample`` — exact per-group quotas, deterministic order.
  * ``chunk_documents``   — overlapping token-window chunking (1:N explode).
  * ``pack_sequences``    — greedy-by-order packing of docs into fixed
                            token-budget bins, sharded for parallelism.
  * ``pii_redact``        — regex scrub of emails/phones/SSNs + hit counts.

Design rules: pure Catalyst expressions (no Python in the row path), every
randomness replaced by the md5-derived ``hash60`` so results are
reproducible run-to-run AND reproducible in the DuckDB oracle; shuffles
only where semantics demand them (sample: one window per group;
pack: one window per shard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from etl_io_spark.caching import persist_tracked
from etl_io_spark.operators.text import (
    hash60,
    spread_text,
    token_count_ws,
    tokens,
)
from etl_io_spark.partitioning import spread

#: split thresholds are expressed in basis points of the hash ring so
#: fractions like 0.8/0.1/0.1 are exact integers.
SPLIT_RING = 10_000


def split_assign(
    df: DataFrame,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Assign each row to train/val/test by hashing its id onto a
    10 000-point ring — deterministic, reproducible, and stable under
    corpus growth (a doc's split never depends on other rows; adding data
    never reshuffles old assignments — the property random splits lack).

    Scale: pure map, no shuffle, no state. The same expression assigns a
    row on one executor or a thousand."""
    bucket = F.pmod(hash60(F.col(id_col).cast("string")), F.lit(SPLIT_RING))
    t = int(round(train * SPLIT_RING))
    v = int(round(val * SPLIT_RING))
    split = (
        F.when(bucket < t, F.lit("train"))
        .when(bucket < t + v, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    quota: int,
) -> DataFrame:
    """Exact ``quota`` rows per group, chosen as the smallest hash values —
    a deterministic stand-in for uniform sampling with exact group sizes
    (the thing ``df.sampleBy`` can't promise: its fractions are expected,
    not exact).

    Plan: one shuffle keyed by the group, rank by (hash, id), keep <=
    quota. Hot groups are bounded by the quota itself on the way OUT; on
    the way IN a skewed group concentrates rank work on one partition —
    at 100 TB pre-aggregate with a per-partition top-quota (TakeOrdered
    shape) before the window if a single group dominates."""
    w = Window.partitionBy(group_col).orderBy(
        hash60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= quota)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into overlapping windows of whitespace tokens
    (stride = chunk_tokens - overlap) — the standard pre-tokenization
    chunking for context-window-bounded training. Emits one row per chunk
    with its index, text, and token count; empty docs produce no rows.

    The generator emits finished (index, text, n) structs so the token
    array is consumed INSIDE the Generate — nothing row-multiplied carries
    the parent array (same copy-avoidance as the Jaccard shingle plan).
    Scale: pure map-side 1:N explode, no shuffle."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    # spread_text (r12-opt): the tokenize+slice generator is a pure
    # per-doc map with NO downstream shuffle, so parallelism is free
    # (interleaved A/B at sf0.1: 0.40 -> 0.22 s median of 5)
    toked = spread_text(df).select(F.col(id_col), tokens(text_col).alias("__toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("__toks"), F.lit(1)), F.lit(stride)
    )
    # drop starts that only re-cover the tail of the previous chunk: a
    # start strictly past (size - overlap) adds no new tokens unless it is
    # the first chunk.
    chunk = lambda s: F.slice(F.col("__toks"), s, chunk_tokens)  # noqa: E731
    structs = F.filter(
        F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_index"),
                F.array_join(chunk(s), " ").alias("chunk_text"),
                F.size(chunk(s)).alias("n_tokens"),
            ),
        ),
        lambda st: (st["chunk_index"] == 0) | (st["n_tokens"] > F.lit(overlap)),
    )
    return (
        toked.where(F.size("__toks") > 0)
        .select(F.col(id_col), F.explode(structs).alias("__c"))
        .select(
            id_col,
            F.col("__c.chunk_index").alias("chunk_index"),
            F.col("__c.chunk_text").alias("chunk_text"),
            F.col("__c.n_tokens").alias("n_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ctx_tokens: int = 512,
    n_shards: int = 32,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Pack documents into fixed token-budget bins (context windows) by
    greedy accumulation in deterministic hash order — the
    sequence-packing step that turns a filtered corpus into training rows.

    Docs are first sharded by id hash; packing runs independently per
    shard (window sort per shard, not a global sort — the difference
    between a parallel plan and a single-reducer plan at 100 TB). Within a
    shard, docs are ordered by (hash, id) and a running token sum assigns
    bin = floor(prev_cumsum / ctx); a doc longer than the budget gets its
    own bin (chunk first via ``chunk_documents`` if that matters).

    Output: (id, [group_cols,] shard, bin_id, n_tokens, tok_start) —
    bin_id is unique within a ``group_cols`` combination (shard * 2^32 +
    local bin). ``group_cols`` confines packing within those columns
    (e.g. ``("split",)`` so train/val/test docs never share a bin — the
    training-pipeline composition needs exactly that boundary).

    NULL-text docs are EXCLUDED up front (ADVICE r9): ``token_count_ws``
    is NULL-in → NULL-out, and a NULL token count would skip the running
    sum (budgets stay right) yet still occupy a slot in some bin — a
    packed "sequence" with no tokens. Dropping them makes the exclusion
    explicit rather than an accident of SUM's null-skipping."""
    shard = F.pmod(hash60(F.col(id_col).cast("string")), F.lit(n_shards))
    toks = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        *group_cols,
        shard.alias("shard"),
        token_count_ws(text_col).alias("n_tokens"),
    )
    w = (
        Window.partitionBy(*group_cols, "shard")
        .orderBy(hash60(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    local_bin = F.floor((cum - F.col("n_tokens")) / F.lit(ctx_tokens))
    return toks.select(
        id_col,
        *group_cols,
        "shard",
        (F.col("shard") * F.lit(1 << 32) + local_bin).alias("bin_id"),
        "n_tokens",
        (cum - F.col("n_tokens")).alias("tok_start"),
    )


def weighted_mix(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    id_col: str,
) -> DataFrame:
    """Deterministic per-group downsampling to target mixture rates — the
    "domain mixing" step of training-data assembly (e.g. keep 100% of
    wiki, 30% of web). A row survives iff its id hash lands below its
    group's threshold on the 10 000-point ring; groups absent from
    ``rates`` are dropped (rate 0).

    Same properties as ``split_assign``: pure map, no shuffle, per-row
    stable under corpus growth; unlike ``df.sampleBy`` the decision is
    reproducible across runs and engines."""
    bucket = F.pmod(hash60(F.col(id_col).cast("string")), F.lit(SPLIT_RING))
    thresh = F.lit(0)
    for g, r in rates.items():
        thresh = F.when(
            F.col(group_col) == g, F.lit(int(round(r * SPLIT_RING)))
        ).otherwise(thresh)
    return df.where(bucket < thresh)


#: PII patterns kept to syntax shared by Java regex (Spark) and RE2
#: (DuckDB): no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_redact(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Scrub common PII shapes, replacing each hit with ``[<KIND>]`` and
    counting hits per kind. Pure regexp expressions — at scale this is a
    free rider on whatever scan already touches the text."""
    out: Column = F.col(text_col)
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(
            F.regexp_count(out, F.lit(pat)).alias(f"n_{kind}")
        )
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    # spread_text (r12-opt): the regex battery is map-only (no shuffle
    # follows), so the text-tuned split floor parallelizes it for free
    # (interleaved A/B at sf0.1: 0.46 -> 0.18 s median of 5)
    return spread_text(df).select(
        F.col(id_col), *counts, out.alias("redacted_text")
    )


def _quality_gated(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int,
    min_quality: float,
) -> DataFrame:
    """The shared quality gate of ``curate_corpus`` / ``curation_pipeline``:
    (id, text, __nw word count, __q score in [0,1]) filtered to the docs
    that clear both thresholds. Pure map stage; the score IS
    ``text.quality_score_expr`` (one definition — a previous inline copy
    here had to be edited in lockstep with text.py and desynchronizing
    them would silently split this gate from ``quality_features`` and
    their interchangeable oracles)."""
    from etl_io_spark.operators.text import quality_score_expr

    n_words = token_count_ws(text_col)
    score = quality_score_expr(text_col)
    return (
        spread(df)
        .select(F.col(id_col), F.col(text_col), n_words.alias("__nw"))
        .withColumn("__q", F.round(score, 2))
        .where((F.col("__nw") >= min_words) & (F.col("__q") >= min_quality))
    )


def _exact_dedup_min_id(
    gated: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact dedup, lowest id per identical text — one window over the
    60-bit content key (the only data-sized exchange of the curate path)."""
    w = Window.partitionBy(hash60(F.col(text_col)))
    return gated.withColumn("__keep", F.min(id_col).over(w)).where(
        F.col(id_col) == F.col("__keep")
    ).drop("__keep")


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_quality: float = 0.7,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """End-to-end corpus curation: quality gate -> exact dedup (keep the
    lowest id per identical text) -> deterministic split assignment ->
    per-split corpus accounting. The canonical pre-training data path,
    composed from this engine's graded primitives (``quality_features``
    semantics, ``hash60`` content keys, ``split_assign`` ring).

    Shuffle budget: one window over the 60-bit content key (dedup), one
    final tiny aggregate. The quality gate and split assignment are pure
    map stages fused around them; at 100 TB the content-key exchange is
    the only data-sized transfer.
    """
    gated = _quality_gated(df, id_col, text_col, min_words, min_quality)
    deduped = _exact_dedup_min_id(gated, id_col, text_col)
    split = split_assign(deduped, id_col, train=train, val=val)
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nw").alias("total_words"),
        F.round(F.avg("__q"), 4).alias("avg_quality"),
    )


def curation_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_quality: float = 0.7,
    train: float = 0.8,
    val: float = 0.1,
    ctx_tokens: int = 512,
    num_perm: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.5,
) -> dict[str, DataFrame]:
    """The brief's actual 100 TB workload as ONE composition: quality gate
    → exact dedup (lowest id per identical text) → FUZZY dedup
    (MinHash-LSH candidates → connected components → keep the longest
    member per cluster) → deterministic split assignment → per-split
    sequence packing — each stage a graded primitive of this engine,
    chained end-to-end (VERDICT r6 ask #7).

    Returns the stage DataFrames plus a one-row ``accounting`` frame
    whose columns satisfy exact row conservation at EVERY stage::

        n_in        = n_quality_removed + n_gated
        n_gated     = n_exact_removed   + n_exact_kept
        n_exact_kept= n_fuzzy_removed   + n_kept
        n_kept      = n_packed_docs        (packing is 1:1 per doc)

    Scale shape: the gate is a pure map; exact dedup is one content-key
    window; fuzzy dedup is the banded-LSH path (never all-pairs) plus
    O(log n) component rounds; split is a pure map; packing is one
    window per (split, shard). The only driver synchronization is the
    connected-components convergence loop — inherent to
    loop-until-converged. Stage outputs consumed by both the next stage
    and the accounting are persisted (lazily) so accounting adds counts,
    not recomputation.
    """
    from etl_io_spark.operators import dedup as _dedup

    gated = persist_tracked(
        _quality_gated(df, id_col, text_col, min_words, min_quality)
    )
    exact_kept = persist_tracked(_exact_dedup_min_id(gated, id_col, text_col))
    pairs = _dedup.minhash_lsh_candidates(
        exact_kept.select(id_col, text_col),
        id_col,
        text_col,
        num_perm=num_perm,
        bands=bands,
    ).where(F.col("est_jaccard") >= min_est_jaccard)
    # keep the LONGEST member of each near-dup cluster (ties to lowest id)
    decision = _dedup.keep_best_of_clusters(
        exact_kept.select(id_col, F.col("__nw").alias("__len")),
        pairs,
        id_col,
        "__len",
    )
    kept = persist_tracked(
        exact_kept.join(
            decision.where(F.col("keep")).select(id_col), id_col, "left_semi"
        )
    )
    split = split_assign(kept, id_col, train=train, val=val)
    packed = pack_sequences(
        split, id_col, text_col, ctx_tokens=ctx_tokens, group_cols=("split",)
    )
    c = lambda d: d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))  # noqa: E731
    accounting = (
        c(df).select(F.col("n").alias("n_in"))
        .crossJoin(c(gated).select(F.col("n").alias("n_gated")))
        .crossJoin(c(exact_kept).select(F.col("n").alias("n_exact_kept")))
        .crossJoin(c(kept).select(F.col("n").alias("n_kept")))
        .crossJoin(
            packed.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_packed_docs"),
                F.count_distinct(F.col("split"), F.col("bin_id")).alias("n_bins"),
                F.sum("n_tokens").alias("total_tokens"),
            )
        )
        .select(
            "n_in",
            (F.col("n_in") - F.col("n_gated")).alias("n_quality_removed"),
            "n_gated",
            (F.col("n_gated") - F.col("n_exact_kept")).alias("n_exact_removed"),
            "n_exact_kept",
            (F.col("n_exact_kept") - F.col("n_kept")).alias("n_fuzzy_removed"),
            "n_kept",
            "n_packed_docs",
            "n_bins",
            "total_tokens",
        )
    )
    return {
        "gated": gated,
        "exact_kept": exact_kept,
        "kept": kept,
        "split": split,
        "packed": packed,
        "accounting": accounting,
    }


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    round_to: int = 9,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-Spirakis
    exponential-key trick: each row draws ``u ∈ (0,1)`` and keeps key
    ``ln(u)/w`` — the k LARGEST keys are exactly a weight-proportional
    sample without replacement. The draw is a deterministic hash of the
    id (not ``rand()``), so the sample is reproducible run-to-run and
    engine-to-engine, and adding rows never reshuffles the survivors'
    relative order — the property that makes incremental re-sampling
    cheap.

    Plan: pure map to compute keys + ONE TakeOrdered top-k — no shuffle
    beyond the k-row reduction, no per-group state. Rows with
    non-positive weight are excluded (their inclusion probability is 0).

    The ranking uses the UNROUNDED key: |key| ~ 1/w, so rounding the
    ranking column to ``round_to`` decimals would collapse keys into ties
    (broken by id ascending — no longer weight-proportional) once weights
    exceed ~10^(round_to-3). Only the EMITTED ``sample_key`` column is
    rounded, for cross-engine value parity; order parity holds because
    both engines compute the key with identical IEEE ops on identical
    doubles (ln is the one library call — a last-ulp ln divergence would
    need two keys within ~1e-16 relative to flip the order).
    """
    from etl_io_spark.functions.numeric import round_pz

    h = hash60(F.col(id_col).cast("string"))
    # u in (0, 1): (h + 0.5) / 2^60 — never 0 or 1, so ln(u) is finite
    u = (h.cast("double") + F.lit(0.5)) / F.lit(1152921504606846976.0)
    key = F.log(u) / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__rank_key", key)
        # keys are <= 0; round_pz normalizes the -0.0 a near-zero key
        # rounds to (negative-zero parity, see functions/numeric.py)
        .withColumn("sample_key", round_pz(key, round_to))
        .orderBy(F.col("__rank_key").desc(), F.col(id_col))
        .limit(k)
        .drop("__rank_key")
    )


def rendezvous_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: every row
    scores each shard with ``hash(id ':' shard)`` and routes to the
    argmax. Unlike ``pmod(hash, n)``, resizing from N to N+1 shards
    remaps ONLY ~1/(N+1) of rows (those whose new shard wins the
    rendezvous) — the stability property that keeps incremental
    pipelines, shard-local caches and bucketed layouts valid across
    resizes.

    Pure map: the per-shard scores live in one in-row array
    (``transform`` over ``sequence``), reduced with ``array_max`` over
    (score, shard) structs — no explode, no shuffle, no UDF.
    """
    scored = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.struct(
            hash60(
                F.concat(F.col(id_col).cast("string"), F.lit(":"), s.cast("string"))
            ).alias("h"),
            s.alias("shard"),
        ),
    )
    return df.withColumn("shard", F.array_max(scored)["shard"])


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    n_shards: int = 32,
) -> DataFrame:
    """Deterministic per-epoch reshuffle: the training order for epoch
    ``e`` is a pure function of ``(id, e)`` — every run, resume, and
    engine reproduces the same permutation, and successive epochs are
    decorrelated (the property seeded RNG shuffles lose the moment
    parallelism or resume order changes).

    No global sort (the single-reducer anti-pattern at 100 TB): rows
    route to ``n_shards`` hash shards and get a position WITHIN their
    shard — readers consume shards in parallel, shard-then-position is
    the reproducible order. One keyed window sort per shard; ties on
    the 60-bit hash break by id, so the permutation is total."""
    h = hash60(
        F.concat(F.col(id_col).cast("string"), F.lit(f"#e{int(epoch)}"))
    )
    shard = F.pmod(h, F.lit(n_shards))
    w = Window.partitionBy(shard).orderBy(h, F.col(id_col))
    return df.select(
        F.col(id_col),
        shard.alias("shard"),
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.3,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-based mixture weights (the multilingual-corpus
    balancing rule): sampling probability ``p_i ∝ n_i^α`` — α=1 keeps
    the natural distribution, α→0 flattens toward uniform, α≈0.3 is the
    standard compromise that up-weights low-resource groups without
    drowning the head. Emits, per group: raw share, temperature share,
    and the boost factor (temperature ÷ raw — >1 means the group gets
    upsampled).

    One partial-aggregable groupBy plus a single-row broadcast of the
    normalizers — the fact is scanned once; no collect.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    powed = F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
    tot = counts.agg(
        F.sum("n_docs").alias("__N"), F.sum(powed).alias("__Z")
    )
    p_raw = F.col("n_docs") / F.col("__N")
    p_temp = powed / F.col("__Z")
    return counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        F.round(p_raw, round_to).alias("p_raw"),
        F.round(p_temp, round_to).alias("p_temp"),
        F.round(p_temp / p_raw, round_to).alias("boost"),
    )


def mixture_token_plan(
    df: DataFrame,
    group_col: str,
    text_col: str,
    weights_bp: dict[str, int],
    budget_tokens: int,
    default_bp: int = 0,
    max_epochs_bp: int = 40_000,
    round_to: int = 6,
) -> DataFrame:
    """Token-budget mixture plan — the published "data recipe" table of
    a training run (Pile/LLaMA-style): given per-group TARGET shares (in
    basis points of ``budget_tokens``) and the tokens actually available
    per group, emit per group the target token count, the repeat factor
    (epochs) needed to hit it, the planned tokens after the repeat cap,
    and the unmet deficit. Groups absent from ``weights_bp`` get
    ``default_bp``; shares need not sum to 10 000 (the spec is
    per-group targets, not a simplex).

    Everything except the display epochs is EXACT int64 arithmetic
    (``target = budget·bp div 10⁴``, ``cap = available·max_epochs_bp
    div 10⁴``, ``planned = least(target, cap)``), so the plan is
    bit-identical on any engine at any scale; epochs is the one ratio
    column, floor-form rounded from identical exact-int inputs.

    Shape: ONE partial-aggregable groupBy over the corpus (the token
    count sums map-side) — the full text is scanned exactly once; the
    plan table is |groups| rows. Reference intent: the reference has no
    training-data surface at all (SURVEY.md §1.3); this completes the
    mixing family (weighted_mix = execute rates, temperature_mix =
    derive shares from counts, THIS = budget the shares against
    availability).
    """
    # zero-arg create_map builds a map<void,void> that cannot be probed
    # with a string key — an empty spec means every group gets default_bp
    bp_map = (
        F.create_map(
            *[F.lit(x) for g, b in sorted(weights_bp.items()) for x in (g, b)]
        )
        if weights_bp
        else F.lit(None).cast("map<string,bigint>")
    )
    avail = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_ws(text_col)).cast("bigint").alias(
            "tokens_available"
        ),
    )
    keyed = avail.withColumn(
        "__bp",
        F.coalesce(
            F.element_at(bp_map, F.col(group_col)), F.lit(default_bp)
        ).cast("bigint"),
    )
    # exact integer division — Spark `div` here, DuckDB `//` in oracles
    target = F.expr(
        f"CAST({int(budget_tokens)} AS BIGINT) * __bp div 10000"
    )
    cap = F.expr(
        f"tokens_available * CAST({int(max_epochs_bp)} AS BIGINT) div 10000"
    )
    planned = F.least(target, cap)
    epochs = F.when(
        F.col("tokens_available") > 0,
        F.floor(
            planned / F.col("tokens_available") * F.lit(10.0**round_to)
            + F.lit(0.5)
        )
        / F.lit(10.0**round_to),
    ).otherwise(F.lit(0.0))
    return keyed.select(
        group_col,
        "n_docs",
        "tokens_available",
        target.cast("bigint").alias("target_tokens"),
        planned.cast("bigint").alias("planned_tokens"),
        epochs.alias("epochs"),
        (target - planned).cast("bigint").alias("deficit_tokens"),
    )


def dsir_logratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    buckets: int = 256,
    round_to: int = 6,
) -> DataFrame:
    """DSIR-style importance weight per document (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): hash
    unigram+bigram features into ``buckets`` buckets, fit add-one-smoothed
    bucket distributions for the TARGET slice (rows where ``target_pred``)
    and the RAW corpus (all rows), and score every document by the mean
    log-likelihood ratio of its features:

        weight(d) = avg_{f in d} ln( p_target(bucket(f)) / p_raw(bucket(f)) )

    High scores mean "looks like the target domain" — the standard recipe
    for up-sampling quality/domain-matched data before training. Returns
    ``(id, n_features, dsir_logratio)``; docs with no tokens are absent.

    Shape: one INDEX explode over the bound token array (positions
    1..2n−1: the first n are unigrams, the rest build bigram p−n from
    two ``element_at`` reads — r12 rewrite; no bigram ARRAY is ever
    materialized and no higher-order lambda runs: the previous
    ``zip_with``-over-slices form paid interpreted lambda evaluation
    per bigram, and the raw feature-stream pass measured 13.8 → 3.1 s
    at 500k docs when rewritten this way), ONE bucket-count partial agg
    (raw and target counted together via a conditional count) whose
    output is ``buckets``-sized, a broadcast ratio join back onto the
    feature stream, one per-doc partial agg. The (id, tgt, bucket)
    stream is PERSISTED (round-6; no shuffle to produce) so the
    tokenize + md5 work runs once instead of once per pass —
    re-measured with the r12 expression at 500k docs: persist 27.9 s
    vs no-persist 59.3 s; full op 34.1 → 27.9 s (1.9x vs the DuckDB
    oracle, inside the 2x gate). Round-5 rejects still stand:
    per-doc bucket HISTOGRAM persist (full-stream shuffle) and
    broadcast lr-array folded with ``aggregate`` (interpreted lambda).
    The feature hash is the md5-derived ``hash60`` so the DuckDB oracle
    reproduces every bucket exactly. Caller drains the pin via
    ``caching.drain_persisted()`` (standard contract).
    """
    base = spread(df).select(
        F.col(id_col), target_pred.alias("__tgt"), tokens(text_col).alias("__t")
    ).where(F.size("__t") >= 1)
    n = F.size("__t")
    pos = base.select(
        id_col,
        "__tgt",
        "__t",
        F.explode(F.sequence(F.lit(1), F.lit(2) * n - 1)).alias("__i"),
    )
    i = F.col("__i")
    feat = F.when(i <= n, F.element_at("__t", i)).otherwise(
        F.concat(
            F.element_at("__t", i - n),
            F.lit(" "),
            F.element_at("__t", i - n + F.lit(1)),
        )
    )
    feats = persist_tracked(
        pos.select(
            id_col, "__tgt", (hash60(feat) % buckets).alias("__bk")
        )
    )
    # ONE pass over the feature stream counts raw and target together
    # (conditional count instead of a second filtered scan — the explode
    # + md5 hashing is the corpus-proportional cost and used to run once
    # per count table); totals reduce the buckets-sized output, not the
    # corpus.
    counts = feats.groupBy("__bk").agg(
        F.count(F.lit(1)).alias("__cr"),
        F.count(F.when(F.col("__tgt"), F.lit(1))).alias("__ct"),
    )
    totals = counts.agg(
        F.coalesce(F.sum("__cr"), F.lit(0)).alias("__nr"),
        F.coalesce(F.sum("__ct"), F.lit(0)).alias("__nt"),
    )
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "__bk",
        F.log(
            (
                (F.col("__ct") + F.lit(1.0))
                / (F.col("__nt") + F.lit(float(buckets)))
            )
            / (
                (F.col("__cr") + F.lit(1.0))
                / (F.col("__nr") + F.lit(float(buckets)))
            )
        ).alias("__lr"),
    )
    from etl_io_spark.functions.numeric import round_pz

    return (
        feats.join(F.broadcast(ratio), "__bk")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            round_pz(F.avg("__lr"), round_to).alias("dsir_logratio"),
        )
    )


def target_encode_oof(
    df: DataFrame,
    id_col: str,
    cat_col: str,
    target_col: str,
    folds: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Out-of-fold target encoding — the leakage-safe categorical encoder
    (each fold's encoding averages the OTHER folds' targets, so a row
    never sees its own label): ``(category, fold, n_rows, oof_mean)``.

    Folds are md5-assigned from the row id (deterministic, reproducible
    in any engine — the same device as split_assign). ONE (cat, fold)
    partial-aggregable groupBy; per-category totals ride an unordered
    window over the tiny aggregate, and the leave-fold-out mean is pure
    arithmetic: (Σ_all − Σ_fold) / (n_all − n_fold). A category living
    entirely in one fold has no out-of-fold data → NULL (callers back
    off to the global prior). Cost is one shuffle of |rows| pre-combined
    to |cats|·folds — at 100 TB this is the cheapest leakage-safe
    encoder there is.

    Means of fixed-decimal measures are int/int-like terminating ratios
    → floor-form rounding (functions/numeric.round_floor).
    """
    from etl_io_spark.functions.numeric import round_floor

    fold = F.pmod(hash60(F.col(id_col).cast("string")), F.lit(folds))
    per = df.select(
        F.col(cat_col).alias("category"),
        fold.alias("fold"),
        F.col(target_col).cast("double").alias("__t"),
    ).groupBy("category", "fold").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__t").alias("__s"),
    )
    w = Window.partitionBy("category")
    oof = (F.sum("__s").over(w) - F.col("__s")) / (
        F.sum("n_rows").over(w) - F.col("n_rows")
    )
    return per.select(
        "category",
        F.col("fold").cast("int").alias("fold"),
        "n_rows",
        F.when(
            F.sum("n_rows").over(w) > F.col("n_rows"), round_floor(oof, round_to)
        ).alias("oof_mean"),
    )


def mixture_waterfill(
    df: DataFrame,
    group_col: str,
    text_col: str,
    weights_bp: dict[str, int],
    budget_tokens: int,
    default_bp: int = 0,
    max_epochs_bp: int = 40_000,
) -> DataFrame:
    """Water-filling token allocation: split ``budget_tokens`` across
    groups in proportion to their weights, CAPPED by each group's
    availability (``tokens_available * max_epochs_bp / 10^4``), with the
    deficit of saturated groups REDISTRIBUTED to the rest — the
    allocator ``mixture_token_plan`` stops short of (it reports unmet
    deficits; this one finds the water level λ with
    ``Σ min(cap_i, λ·w_i) = budget``). Completes the mixing family:
    weighted_mix executes rates, temperature_mix derives shares,
    mixture_token_plan budgets shares against availability, THIS
    reallocates.

    Closed form, no iteration: sort groups by ``cap/weight`` ascending —
    the saturated set is always a PREFIX of that order — and test each
    prefix with EXACT int64 cross-multiplication
    (``cap_i·W_rem <= B_rem·w_i``, no float λ ever materializes).
    Unsaturated groups get ``(B - Σ sat caps)·w_i div W_unsat`` plus a
    largest-remainder distribution of the flooring shortfall (at most
    |unsaturated|-1 tokens, +1 apiece to the biggest remainders, ties
    by group name) — the allocation is an exact integer partition of
    ``min(budget, Σ caps)``, bit-identical on any engine. Zero-weight
    groups allocate 0; when every weighted group saturates, the
    leftover stays unallocated (visible as Σ planned < budget).

    Shape: one partial-aggregable groupBy over the corpus (the only
    data-sized stage — the text is scanned once); everything after is
    |groups| rows under single-partition windows (the group frame is
    mixture-spec-sized by construction)."""
    bp_map = (
        F.create_map(
            *[F.lit(x) for g, b in sorted(weights_bp.items()) for x in (g, b)]
        )
        if weights_bp
        else F.lit(None).cast("map<string,bigint>")
    )
    avail = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_ws(text_col)).cast("bigint").alias(
            "tokens_available"
        ),
    )
    keyed = avail.withColumn(
        "weight_bp",
        F.coalesce(
            F.element_at(bp_map, F.col(group_col)), F.lit(default_bp)
        ).cast("bigint"),
    ).withColumn(
        "cap_tokens",
        F.expr(
            f"tokens_available * CAST({int(max_epochs_bp)} AS BIGINT)"
            " div 10000"
        ),
    )
    B = F.lit(int(budget_tokens)).cast("bigint")
    ratio = F.when(
        F.col("weight_bp") > 0,
        F.col("cap_tokens").cast("double") / F.col("weight_bp"),
    ).otherwise(F.lit(float("inf")))
    order = Window.orderBy(ratio.asc(), F.col(group_col).asc())
    every = order.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    prior = order.rowsBetween(Window.unboundedPreceding, -1)
    c_prev = F.coalesce(F.sum("cap_tokens").over(prior), F.lit(0))
    w_prev = F.coalesce(F.sum("weight_bp").over(prior), F.lit(0))
    w_tot = F.sum("weight_bp").over(every)
    # saturated iff cap/w <= (B - C_prev)/(W_tot - W_prev), cross-mult
    sat = (F.col("weight_bp") > 0) & (
        F.col("cap_tokens") * (w_tot - w_prev) <= (B - c_prev) * F.col("weight_bp")
    )
    base = keyed.withColumn("__sat", sat)
    c_sat = F.coalesce(
        F.sum(F.when(F.col("__sat"), F.col("cap_tokens"))).over(every),
        F.lit(0),
    )
    w_unsat = F.coalesce(
        F.sum(F.when(~F.col("__sat"), F.col("weight_bp"))).over(every),
        F.lit(0),
    )
    num = (B - c_sat) * F.col("weight_bp")
    xfloor = F.when(
        F.col("__sat"), F.col("cap_tokens")
    ).when(w_unsat > 0, F.expr("__num div __wu")).otherwise(F.lit(0))
    b2 = (
        base.withColumn("__num", F.when(~F.col("__sat"), num).otherwise(F.lit(0)))
        .withColumn("__wu", w_unsat)
        .withColumn("__cs", c_sat)
        .withColumn("__xf", xfloor)
    )
    shortfall = F.when(
        F.col("__wu") > 0,
        (B - F.col("__cs"))
        - F.sum(F.when(~F.col("__sat"), F.col("__xf")).otherwise(F.lit(0))).over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    ).otherwise(F.lit(0))
    rem = F.when(
        (~F.col("__sat")) & (F.col("weight_bp") > 0) & (F.col("__wu") > 0),
        F.col("__num") % F.col("__wu"),
    ).otherwise(F.lit(-1))
    rn = F.row_number().over(
        Window.orderBy(rem.desc(), F.col(group_col).asc())
    )
    b3 = b2.withColumn("__short", shortfall).withColumn(
        "__bonus",
        F.when((rem >= 0) & (rn <= F.col("__short")), 1).otherwise(0),
    )
    return b3.select(
        group_col,
        "n_docs",
        "tokens_available",
        "cap_tokens",
        "weight_bp",
        F.col("__sat").alias("saturated"),
        (F.col("__xf") + F.col("__bonus")).cast("bigint").alias(
            "planned_tokens"
        ),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Byte-pair-encoding tokenizer TRAINING: learn ``n_merges`` merge
    rules from the corpus (the real upgrade of ``token_count_bpe``'s
    regex proxy and ``tokenizer_fertility``'s diagnostic — reference
    scope stops at tabulation, etl_io.py:947). Returns the merge table:
    one row per round — ``(round, lsym, rsym, pair_count)``, the pair
    merged that round and its corpus frequency at merge time.

    Algorithm (Sennrich et al. 2016, "Neural Machine Translation of
    Rare Words with Subword Units"): collapse the corpus to a
    (word, freq) vocabulary; start from character segmentations; each
    round count adjacent symbol pairs weighted by word frequency, merge
    the most frequent pair (ties: lexicographic smallest (left, right))
    greedily left-to-right non-overlapping in every word.

    Spark shape — corpus-sized work happens ONCE: a single tokenize +
    groupBy(word) pass builds the vocabulary; every merge round runs
    over the VOCAB table (distinct words — orders of magnitude smaller
    than the corpus, and constant across rounds). Per round: one
    map-side pair explode + partially-aggregated groupBy(pair), one
    TakeOrdered argmax (a 1-row driver collect, same class as the
    connected-components convergence count), then a NARROW map that
    rewrites segmentations — no shuffle. The rewritten vocab is
    persisted per round (lineage stays depth-1; a lazy unrolled plan
    would nest the vocab subtree twice per round = 2^R logical-plan
    blowup).

    Cross-engine exactness: the segmentation is a DOUBLE-SPACE-joined
    symbol string (``"  h  e  y  "``) — merging pair (a, b) is then the
    literal ``replace(seg, ' a  b ', ' ab ')``: each match consumes one
    space of each flanking pair, so adjacent matches stay matchable and
    scanning resumes past the replacement — exactly greedy
    left-to-right non-overlapping BPE, with identical semantics in
    Spark's ``replace`` and DuckDB's (verified incl. the ``aaa`` +
    ``(a,a)`` overlap case; RE2 has no lookarounds, so the classic
    regex formulation cannot be mirrored). Words are lowercased and
    restricted to pure ``a-z`` via a ``translate`` deletion test (no
    regex, no locale exposure); counts are integral; the argmax
    tie-break (count DESC, left ASC, right ASC) is a total order over
    ASCII strings on both engines.

    NULL contract: NULL text rows are dropped explicitly (the oracle's
    UNNEST over split tokens drops them implicitly)."""
    wf = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.lower(F.col(text_col)).alias("__lt"))
        .select(F.explode(tokens("__lt")).alias("__w"))
        .where(
            (F.col("__w") != "")
            & (
                F.length(
                    F.translate(
                        F.col("__w"), "abcdefghijklmnopqrstuvwxyz", ""
                    )
                )
                == 0
            )
        )
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__freq"))
    )
    seg = F.concat(
        F.lit("  "), F.array_join(F.split("__w", ""), "  "), F.lit("  ")
    )
    w = persist_tracked(wf.select("__freq", seg.alias("__seg")))
    prev: DataFrame | None = None
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, int(n_merges) + 1):
        syms = F.filter(
            F.split("__seg", "  ", -1), lambda x: x != F.lit("")
        )
        base = w.select("__freq", syms.alias("__syms")).where(
            F.size("__syms") >= 2
        )
        pair = F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__syms") - 1),
                lambda i: F.struct(
                    F.element_at("__syms", i).alias("l"),
                    F.element_at("__syms", i + F.lit(1)).alias("r"),
                ),
            )
        )
        cnts = (
            base.select("__freq", pair.alias("__p"))
            .groupBy(
                F.col("__p.l").alias("__l"), F.col("__p.r").alias("__r")
            )
            .agg(F.sum("__freq").alias("__cnt"))
        )
        top = cnts.orderBy(
            F.col("__cnt").desc(), F.col("__l").asc(), F.col("__r").asc()
        ).limit(1).collect()
        # this collect materialized w's cache, so the ROUND-BEFORE-LAST
        # vocab (w's parent, fully consumed by that materialization) can
        # be released now — the loop holds at most two cached copies at
        # a time instead of n_merges + 1 (r12 self-review)
        if prev is not None:
            prev.unpersist()
        if not top:
            break
        lsym, rsym, cnt = top[0]["__l"], top[0]["__r"], top[0]["__cnt"]
        merges.append((rnd, lsym, rsym, int(cnt)))
        if rnd == int(n_merges):
            break  # the final re-segmentation has no consumer
        prev = w
        w = persist_tracked(
            w.select(
                "__freq",
                F.replace(
                    "__seg",
                    F.lit(f" {lsym}  {rsym} "),
                    F.lit(f" {lsym}{rsym} "),
                ).alias("__seg"),
            )
        )
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges,
        "round int, lsym string, rsym string, pair_count bigint",
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge list (``bpe_train`` output order) to the
    corpus and report per-document subword cost: ``(doc_id, n_words,
    bpe_tokens)`` over the document's lowercase pure-``a-z`` words (the
    exact training-side filter). The train→apply pair is the end-to-end
    tokenizer-budget pipeline: bpe_tokens/n_words is the corpus
    fertility under the trained merges (upgrade of
    ``tokenizer_fertility``'s static proxy).

    Shape: the merge chain is applied to the DISTINCT word table only
    (``n_merges`` chained literal ``replace``s on the double-space
    segmentation — narrow maps over |vocab| rows, see ``bpe_train`` for
    the representation's engine-identical greedy semantics); symbol
    counts come from pure length arithmetic (symbols = spaces/2 − 1 —
    the representation pads 2(n+1) spaces), not an array split. The
    corpus pays one (doc, word) count shuffle; the |vocab|-row symbol
    table joins AQE-adaptively (broadcast at moderate scale)."""
    words = (
        docs.where(
            F.col(text_col).isNotNull() & F.col(doc_id_col).isNotNull()
        )
        .select(
            F.col(doc_id_col), F.lower(F.col(text_col)).alias("__lt")
        )
        .select(F.col(doc_id_col), F.explode(tokens("__lt")).alias("__w"))
        .where(
            (F.col("__w") != "")
            & (
                F.length(
                    F.translate(
                        F.col("__w"), "abcdefghijklmnopqrstuvwxyz", ""
                    )
                )
                == 0
            )
        )
    )
    dw = words.groupBy(doc_id_col, "__w").agg(
        F.count(F.lit(1)).alias("__k")
    )
    seg = F.concat(
        F.lit("  "), F.array_join(F.split("__w", ""), "  "), F.lit("  ")
    )
    for lsym, rsym in merges:
        seg = F.replace(
            seg, F.lit(f" {lsym}  {rsym} "), F.lit(f" {lsym}{rsym} ")
        )
    nsym = (
        (F.length(seg) - F.length(F.translate(seg, " ", ""))) / F.lit(2)
        - F.lit(1)
    ).cast("bigint")
    # vocab derives from dw, not from the raw word stream: the distinct
    # then shares dw's scan + (doc, word) partial-agg + exchange subtree
    # (ReusedExchange) instead of tokenizing the corpus a second time
    # (r12 self-review — the dsir/boilerplate single-pass cost class)
    vs = dw.select("__w").distinct().select("__w", nsym.alias("__nsym"))
    return (
        dw.join(vs, "__w")
        .groupBy(doc_id_col)
        .agg(
            F.sum("__k").cast("bigint").alias("n_words"),
            F.sum(F.col("__k") * F.col("__nsym"))
            .cast("bigint")
            .alias("bpe_tokens"),
        )
    )
