"""Deterministic sampling, splitting, and sequence packing for
training-data pipelines.

Reproducibility is the requirement at 100 TB: a sample or split must be
(a) stable across reruns/partitionings, (b) leakage-free (a key lands on
exactly one side, forever), (c) cheap (no shuffle for the decision).
All three come from hashing the key, not from RNG state — the same
md5-derived hash family as the dedup/sketch operators, so any engine
reproduces the exact membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datafusion_monoid_spark.operators.dedup import md5_long

#: hash buckets for split/sample decisions (per-mille resolution)
SPLIT_MOD = 1000


def hash_bucket(key: Column | str) -> Column:
    """Stable per-mille bucket of a key: md5_64(key) mod 1000."""
    c = F.col(key) if isinstance(key, str) else key
    return md5_long(c.cast("string")) % SPLIT_MOD


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli-style sample: keeps keys whose bucket
    falls below fraction*1000.  Pure filter — pushes down, no shuffle,
    identical membership on every run and engine."""
    return df.where(hash_bucket(key_col) < int(fraction * SPLIT_MOD))


def train_test_split(df: DataFrame, key_col: str, test_fraction: float = 0.1
                     ) -> tuple[DataFrame, DataFrame]:
    """Leakage-free split: every key is always on the same side."""
    cut = int(test_fraction * SPLIT_MOD)
    b = hash_bucket(key_col)
    return df.where(b >= cut), df.where(b < cut)


def pack_sequences(df: DataFrame, id_col: str, len_col: str,
                   max_tokens: int = 512, n_shards: int = 64) -> DataFrame:
    """Assign documents to training-sequence bins of ~max_tokens.

    Documents hash into ``n_shards`` independent shards (so the window
    sort parallelizes — a single global window would serialize at 100
    TB); within a shard, a deterministic running token cumsum in id
    order gives bin = floor((cumsum - len) / max_tokens).  Bins can
    overflow by less than one document (the standard cheap packer; a
    bin-capacity-exact packer needs stateful iteration).  Over-long
    documents occupy their own bin(s).  Output bin key: (shard, bin_id).
    """
    shard = (md5_long(F.col(id_col).cast("string")) % n_shards).alias("shard")
    w = Window.partitionBy("shard").orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(len_col).over(w)
    return df.select(id_col, len_col, shard).select(
        id_col, len_col, "shard",
        F.floor((cum - F.col(len_col)) / max_tokens).cast("bigint").alias("bin_id"),
    )


def stratified_hash_sample(df: DataFrame, key_col: str, stratum_col: str,
                           fractions: dict[str, float],
                           default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (corpus mixing): each stratum
    keeps its own fraction, decided by the SAME stable hash — still a
    pure filter (pushdown, no shuffle, no RNG state), so the mix is
    reproducible row-for-row on any engine and any partitioning.

    This is the up/down-weighting primitive of training-corpus curation
    (e.g. keep 100% of high-quality strata, 10% of boilerplate).

    The per-stratum cut is a MAP-literal lookup, not a CASE chain: a
    chain references the stratum column once per branch, and when the
    stratum is itself a computed expression (e.g. language ID) projection
    collapse inlines that whole expression into EVERY branch — measured
    ~7x slowdown.  ``element_at`` references it exactly once."""
    entries: list[Column] = []
    for stratum, frac in sorted(fractions.items()):
        entries += [F.lit(stratum), F.lit(int(frac * SPLIT_MOD))]
    cut = F.coalesce(F.element_at(F.create_map(*entries), F.col(stratum_col)),
                     F.lit(int(default_fraction * SPLIT_MOD)))
    return df.where(hash_bucket(key_col) < cut)


def chunk_documents(df: DataFrame, id_col: str, toks_col: str,
                    chunk_tokens: int = 64, overlap: int = 8) -> DataFrame:
    """Split token arrays into overlapping training windows:
    (id, chunk_idx, chunk) with stride ``chunk_tokens - overlap``.

    One generator expression per row (posexplode of slice starts) — no
    shuffle at all; chunking is embarrassingly parallel and stays in the
    scan stage.  Tail chunks are shorter (slice clamps); empty docs
    yield no chunks."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.col(toks_col)
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(step))
    return (
        df.where(F.size(toks) > 0)
        .select(id_col, toks_col,
                F.posexplode(starts).alias("chunk_idx", "start"))
        .select(id_col, "chunk_idx",
                F.slice(toks, F.col("start") + 1, chunk_tokens).alias("chunk"))
    )


# ---------------------------------------------------------------------------
# Priority sampling (Duffield-Lund-Thorup 2007)
# ---------------------------------------------------------------------------

#: Hash universe for priority sampling's per-item "uniform": same 2^40
#: fold as the KMV sketch — wide enough that ties are negligible, narrow
#: enough that w * SPACE stays in BIGINT for per-item weights up to ~8e6.
PRIORITY_SPACE = 1 << 40


def priority_sample(df: DataFrame, weight_col: str, n: int,
                    id_col: str) -> tuple[DataFrame, Column]:
    """Weighted sample of ``n`` items with unbiased total estimation:
    each item gets priority q = w * SPACE / u (u = deterministic
    md5-derived "uniform" in [1, SPACE], exact truncated-integer
    division), the n largest priorities are the sample, and the
    (n+1)-th priority tau is the estimation threshold — the
    Horvitz-Thompson weight of a sampled item is ``greatest(w, tau)``,
    whose sum is unbiased for the population total (Duffield, Lund &
    Thorup, JACM 2007).  Zero-weight items are excluded (their priority
    is identically 0 and their HT contribution undefined); when the
    population is <= n, tau = 0 and the estimate is exact by
    construction.

    Returns (the sampled rows with ``__q``/``__rk`` attached, a 1-row
    ``__tau`` DataFrame to crossJoin-broadcast) — callers compose
    ``greatest(w, tau)`` themselves.  Scale: selection is a global
    top-(n+1) — TakeOrderedAndProject (per-partition top-k + driver
    merge), never a global sort; the n+1 survivors are the only rows a
    window ever sees.  Deterministic: same membership on every run,
    partitioning, and engine.  Lifecycle: the (n+1)-row candidate
    localCheckpoint (needed because both the sample and tau derive
    from it) is bounded and left to the ContextCleaner."""
    w = F.col(weight_col)
    u = md5_long(F.col(id_col).cast("string")) % F.lit(PRIORITY_SPACE) + 1
    q = (((w * F.lit(PRIORITY_SPACE)) - (w * F.lit(PRIORITY_SPACE)) % u)
         / u).cast("bigint")
    cand = (df.where(w > 0).withColumn("__q", q)
            .orderBy(F.col("__q").desc(), F.col(id_col))
            .limit(n + 1)
            .localCheckpoint(eager=True))  # n+1 rows, bounded
    rk = F.row_number().over(
        Window.orderBy(F.col("__q").desc(), F.col(id_col)))
    ranked = cand.withColumn("__rk", rk)
    tau_df = ranked.agg(F.coalesce(
        F.max(F.when(F.col("__rk") == n + 1, F.col("__q"))),
        F.lit(0).cast("bigint")).alias("__tau"))
    return ranked.where(F.col("__rk") <= n), tau_df
