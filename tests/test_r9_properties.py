"""Randomized property tests for the round-9 operators, in the repo's
one-job style: seeded random cases, few Spark jobs, pure-Python specs.

Covers the exact-Viterbi DP (optimality vs greedy + spec equality on
random models), the KMV A-not-B set algebra, the novelty-curve rollup,
and the containment arithmetic."""

import random

from pyspark.sql import functions as F

from datafusion_monoid_spark.operators import sketch as sk
from datafusion_monoid_spark.operators import unigram as ugm

RNG = random.Random(0x9A9A)


def _random_table(alphabet: str) -> ugm.PieceTable:
    """A random piece table over ``alphabet``: every char (coverage)
    plus random multi-char pieces, with random exact-integer counts
    run through the production likelihood normalizer."""
    counts = {c: RNG.randint(1, 50) for c in alphabet}
    for _ in range(RNG.randint(3, 10)):
        ln = RNG.randint(2, ugm.MAXP)
        piece = "".join(RNG.choice(alphabet) for _ in range(ln))
        counts[piece] = RNG.randint(1, 400)
    return ugm._with_p(counts)


def _greedy_py(tok: str, table: ugm.PieceTable) -> list[str]:
    pieces_set = {p for p, _, _ in table}
    out, pos = [], 0
    while pos < len(tok):
        for ln in range(min(ugm.MAXP, len(tok) - pos), 0, -1):
            if ln == 1 or tok[pos:pos + ln] in pieces_set:
                out.append(tok[pos:pos + ln])
                pos += ln
                break
    return out


def _score_py(pieces: list[str], m: dict[str, int]) -> int:
    s = ugm.VIT_BASE
    for p in pieces:
        s = (s >> 6) * m[p]
    return s


def _viterbi_spec(tok: str, m: dict[str, int]) -> tuple[int, int]:
    """(score, n_pieces) by exhaustive DP — the independent spec."""
    best = [(ugm.VIT_BASE, 0)] + [None] * len(tok)
    for j in range(1, len(tok) + 1):
        cand = None
        for ln in range(1, min(ugm.MAXP, j) + 1):
            piece = tok[j - ln:j]
            if piece not in m:
                continue
            s = (best[j - ln][0] >> 6) * m[piece]
            if cand is None or s >= cand[0]:
                cand = (s, best[j - ln][1] + 1)
        best[j] = cand
    return best[len(tok)]


def test_viterbi_random_models_match_spec_and_dominate_greedy(spark):
    """On random models and random tokens: the Spark DP equals the
    exhaustive-DP spec, the reconstruction covers the token and scores
    the DP score, and the Viterbi score >= the greedy path score for
    EVERY token (the optimality property the tier exists for)."""
    dominated = 0
    for trial in range(3):
        alphabet = "abcd"
        table = _random_table(alphabet)
        m = dict(ugm.quantize_p64(table))
        toks = list({"".join(RNG.choice(alphabet)
                             for _ in range(RNG.randint(1, ugm.MAX_TOK)))
                     for _ in range(120)})
        vocab = spark.createDataFrame([(t, 1) for t in toks],
                                      "tok string, cnt bigint")
        rows = ugm.viterbi_segment(vocab, table).collect()
        assert len(rows) == len(toks)
        for r in rows:
            spec_s, spec_n = _viterbi_spec(r.tok, m)
            fin = r.dp[len(r.tok)]
            assert (fin["score"], fin["n"]) == (spec_s, spec_n), r.tok
            assert "".join(r.pieces) == r.tok
            assert _score_py(list(r.pieces), m) == spec_s, r.tok
            gscore = _score_py(_greedy_py(r.tok, table), m)
            assert spec_s >= gscore, r.tok
            if spec_s > gscore:
                dominated += 1
    # the random models must actually exercise the divergence
    assert dominated > 0


def test_kmv_anotb_algebra_matches_set_spec(spark):
    """The union-window A-not-B pipeline (merge -> intersect ->
    except) equals pure-Python set arithmetic on random sketches for
    every case, in ONE Spark job."""
    k = 16
    cases = []
    for i in range(200):
        a = sorted(RNG.sample(range(1, 500), RNG.randint(1, k)))
        b = sorted(RNG.sample(range(1, 500), RNG.randint(1, k)))
        cases.append((i, a, b))
    df = spark.createDataFrame(cases, "i long, sk_a array<bigint>, "
                                      "sk_b array<bigint>")
    got = {r["i"]: r for r in
           df.withColumn(
               "u", sk.kmv_merge(F.col("sk_a"), F.col("sk_b"), k=k))
           .select(
               "i", F.size("u").alias("ku"),
               F.size(F.array_except(F.array_intersect("u", "sk_a"),
                                     "sk_b")).alias("anotb_k"),
               F.size(F.array_except(F.array_intersect("u", "sk_b"),
                                     "sk_a")).alias("bnota_k"))
           .collect()}
    for i, a, b in cases:
        u = sorted(set(a) | set(b))[:k]
        r = got[i]
        assert r["ku"] == len(u)
        assert r["anotb_k"] == sum(1 for h in u
                                   if h in set(a) and h not in set(b))
        assert r["bnota_k"] == sum(1 for h in u
                                   if h in set(b) and h not in set(a))


def test_novelty_rollup_matches_python_spec(spark):
    """The restructured two-partial-agg novelty rollup equals a
    pure-Python spec on random (shingle, bucket) occurrences —
    including conservation (sum of n_new == global distinct) and
    buckets with zero new shingles surviving the left join as 0."""
    occ = [(f"s{RNG.randint(0, 60)}", RNG.randint(0, 9))
           for _ in range(800)]
    # force at least one bucket with NO new shingles: every shingle in
    # bucket 9 also appears in bucket 0
    b9 = {s for s, b in occ if b == 9}
    occ += [(s, 0) for s in b9]
    df = spark.createDataFrame(occ, "sh string, bucket int")
    b1 = (df.groupBy("sh", "bucket")
          .agg(F.count(F.lit(1)).alias("n_occ"))
          .localCheckpoint(eager=True))
    per_bucket = (b1.groupBy("bucket")
                  .agg(F.sum("n_occ").cast("bigint").alias("n_occurrences"),
                       F.count(F.lit(1)).cast("bigint").alias("n_distinct")))
    news = (b1.groupBy("sh").agg(F.min("bucket").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_new")))
    got = {r["bucket"]: r for r in
           per_bucket.join(F.broadcast(news), "bucket", "left")
           .select("bucket", "n_occurrences", "n_distinct",
                   F.coalesce("n_new", F.lit(0).cast("bigint"))
                   .alias("n_new")).collect()}
    first = {}
    for s, b in occ:
        first[s] = min(first.get(s, 99), b)
    buckets = {b for _, b in occ}
    for b in buckets:
        in_b = [(s, bb) for s, bb in occ if bb == b]
        distinct = {s for s, _ in in_b}
        r = got[b]
        assert r["n_occurrences"] == len(in_b)
        assert r["n_distinct"] == len(distinct)
        assert r["n_new"] == sum(1 for s in distinct if first[s] == b)
    assert sum(r["n_new"] for r in got.values()) == len(first)
    assert got[9]["n_new"] == 0  # the constructed no-new bucket


def test_containment_micro_matches_set_spec(spark):
    """Exact containment arithmetic on random string-set pairs equals
    the python set spec in one job (floor-division micro units)."""
    cases = []
    for i in range(300):
        a = list({f"t{RNG.randint(0, 40)}"
                  for _ in range(RNG.randint(1, 25))})
        b = list({f"t{RNG.randint(0, 40)}"
                  for _ in range(RNG.randint(1, 25))})
        cases.append((i, a, b))
    df = spark.createDataFrame(cases, "i long, a array<string>, "
                                      "b array<string>")
    inter = F.size(F.array_intersect("a", "b")).cast("bigint")
    n_a = F.size("a").cast("bigint")
    n_b = F.size("b").cast("bigint")

    def idiv(x, y):
        return ((x - x % y) / y).cast("bigint")

    got = {r["i"]: r for r in
           df.select("i", idiv(inter * 1_000_000, n_a).alias("ca"),
                     idiv(inter * 1_000_000, n_b).alias("cb")).collect()}
    for i, a, b in cases:
        inter_py = len(set(a) & set(b))
        assert got[i]["ca"] == inter_py * 1_000_000 // len(set(a))
        assert got[i]["cb"] == inter_py * 1_000_000 // len(set(b))
