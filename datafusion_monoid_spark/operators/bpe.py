"""Byte-pair-encoding tokenizer training and serving — the missing
half of the tokenizer story (``bpe_top_merges`` computes one round of
merge CANDIDATES; this module runs the actual multi-round trainer and
applies the learned merges).

Semantics contract, shared bit-for-bit with the DuckDB oracle
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — the standard subword trainer):

* Training operates on the WEIGHTED TOKEN VOCABULARY, not the raw
  corpus: one corpus pass builds ``(token, count)``, and every
  subsequent round touches only the vocabulary relation — model-sized
  work per round regardless of corpus size, which is the property that
  makes BPE trainable at 100 TB (the corpus contributes one shuffle,
  ever).
* Each round merges the single most frequent adjacent symbol pair
  (count-weighted; ties broken by ascending symbol order — binary
  comparison on normalized text is identical across engines).
* Merge application is ONE ``replace()`` pass per round over the
  doubled-delimiter segmentation (below) — leftmost, non-overlapping,
  scanning resumes after each replacement; identical in Spark and
  DuckDB, and equal to greedy left-to-right BPE application because
  doubling makes adjacent occurrences share no delimiter.

The doubled-delimiter representation: a token's segmentation is kept
as ``" a  b  c "`` — ONE outer space each side, TWO spaces between
symbols.  A pair ``(x, y)`` then matches ``" x  y "``: the match
consumes one space from each flanking double, and the replacement
``" xy "`` restores one on each side, so the invariant survives every
replacement and consecutive merge sites (``x y x y``) each keep their
own delimiters — a single-space encoding would let the first
replacement eat the delimiter the next occurrence needs, silently
skipping every other site.

No reference analogue (the reference has no text functions); same
discipline as operators/dedup.py: engine-reproducible string ops only,
iteration checkpointed per round like similarity.kmeans_lloyd_quantized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: trainer rounds for the catalog entries — enough to produce
#: multi-symbol merges (round k can merge the output of round j < k)
#: while keeping the unrolled oracle CTE chain readable.
BPE_ROUNDS = 6


def padded_seg(tok: Column) -> Column:
    """Initial character segmentation of a (whitespace-free) token in
    doubled-delimiter form: ``"abc"`` -> ``" a  b  c "``."""
    return F.concat(F.lit(" "),
                    F.rtrim(F.regexp_replace(tok, "(.)", "$1  ")),
                    F.lit(" "))


#: DuckDB twin of :func:`padded_seg` (``{tok}`` is the token expr).
PADDED_SEG_SQL = ("' ' || rtrim(regexp_replace({tok}, '(.)', '\\1  ', "
                  "'g')) || ' '")


def seg_symbols(seg: Column) -> Column:
    """Symbol array of a doubled-delimiter segmentation."""
    return F.split(F.trim(seg), "  ")


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(x, y, c): count-weighted adjacent symbol pair frequencies over
    a ``(tok, cnt, seg)`` vocabulary relation."""
    syms = seg_symbols(F.col("seg"))
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(F.element_at(syms, i).alias("x"),
                               F.element_at(syms, i + 1).alias("y"))),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    return (vocab.select(F.explode(pairs).alias("p"), "cnt")
            .groupBy("p.x", "p.y").agg(F.sum("cnt").alias("c")))


def train(vocab: DataFrame,
          rounds: int = BPE_ROUNDS) -> tuple[DataFrame, DataFrame]:
    """Run ``rounds`` BPE merge rounds over a ``(tok, cnt, seg)``
    vocabulary (``seg`` in doubled-delimiter form).

    Returns ``(merges, final_vocab)``: merges is
    ``(rk, left_sym, right_sym, pair_cnt)`` in learned order, and
    final_vocab is ``(tok, cnt, seg)`` after all merges — the model a
    serve job broadcasts.

    Each round is one vocabulary-sized aggregation (pair counts), a
    top-1 (TakeOrdered, never a global sort), and a map-only replace
    against the 1-row merge broadcast; the round result is
    checkpointed (vocabulary-sized — the same per-iteration
    materialization discipline as the k-means fit; without it each
    round's two references to the previous round double the lineage)."""
    merges = None
    cur = vocab.localCheckpoint(eager=True)
    for r in range(rounds):
        top1 = (pair_counts(cur)
                .orderBy(F.desc("c"), F.asc("x"), F.asc("y")).limit(1))
        m = top1.select(F.lit(r + 1).cast("int").alias("rk"),
                        F.col("x").alias("left_sym"),
                        F.col("y").alias("right_sym"),
                        F.col("c").cast("bigint").alias("pair_cnt"))
        merges = m if merges is None else merges.unionAll(m)
        cur = (cur.crossJoin(F.broadcast(top1))
               .select("tok", "cnt",
                       F.expr("replace(seg, ' ' || x || '  ' || y || ' ',"
                              " ' ' || x || y || ' ')").alias("seg"))
               .localCheckpoint(eager=True))
    return merges, cur
