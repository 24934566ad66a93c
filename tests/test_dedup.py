"""Property tests for MinHash-LSH / SimHash semantics (SURVEY.md §5.2):
Jaccard-similar documents collide with high probability; dissimilar ones
rarely do; identical documents always do.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lens_warehouse_spark.llm.dedup import (
    jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)

VOCAB = [f"tok{i}" for i in range(200)]


def make_docs(spark, rng, n=20, doc_len=40, n_near=5, mutate=3):
    """n base docs + n_near near-duplicates (mutate tokens changed)."""
    rows = []
    for i in range(n):
        toks = [rng.choice(VOCAB) for _ in range(doc_len)]
        rows.append((i, " ".join(toks)))
    for j in range(n_near):
        base_id, base_text = rows[j]
        toks = base_text.split(" ")
        for _ in range(mutate):
            toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
        rows.append((1000 + base_id, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def planted(spark):
    # mutate=1, NOT 3: the sketch measures SHINGLE jaccard, and 3
    # token mutations in a 40-token doc push shingle jaccard down to
    # ~0.62-0.73 — squarely ON the 4x4 banding's ~0.71 S-curve
    # threshold, where expected recall is only ~2.6 of 5 pairs. The
    # pre-round-6 version of this fixture passed only because the old
    # shingle-string hash family happened to draw lucky minima for
    # this seed (deterministically); the round-6 hash rewrite redrew
    # the minima and exposed the test as threshold-straddling. One
    # mutation keeps every planted pair's shingle jaccard >= ~0.85
    # (per-pair collide probability ~0.95) — the regime the recall
    # assertion is actually entitled to.
    docs = make_docs(spark, random.Random(7), mutate=1)
    sigs = minhash_signatures(docs).select("doc_id", "sig")
    pairs = lsh_candidate_pairs(sigs)
    verified = jaccard(pairs, docs)
    return {(r.doc_a, r.doc_b): r.jaccard for r in verified.collect()}


def test_minhash_finds_planted_neardups(planted):
    found = {(a, b) for (a, b) in planted if b == 1000 + a}
    # 1/40 token mutation -> SHINGLE jaccard ~0.85+; 4x4 banding
    # threshold ~0.71 -> per-pair collide probability ~0.95.
    assert len(found) >= 4, f"expected >=4 of 5 planted pairs, got {found}"


def test_minhash_no_gross_false_positives(planted):
    for (a, b), j in planted.items():
        if b != 1000 + a:
            assert j >= 0.2, f"candidate pair ({a},{b}) with tiny jaccard {j}"


def test_identical_docs_have_identical_signature(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g")], "doc_id long, text string"
    )
    sigs = {r.doc_id: tuple(r.sig) for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]


def test_minhash_single_expr_agg_matches_per_seed_column_tree(spark):
    """r13 opt round: minhash_signatures builds its n_hashes min()
    aggregates as ONE parsed SQL expression (plan-construction cost,
    guide §7.3). This pins that the parsed form is bit-identical to
    the per-seed Column tree it replaced — a SQL integer literal seed
    must parse to the same INT literal F.lit(seed) built, or every
    seeded minimum silently shifts."""
    from pyspark.sql import functions as F

    from lens_warehouse_spark.llm.dedup import (
        N_HASHES,
        _shingle_hash_expr,
        _token_hash_expr,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} a b c d e f g h{i} j k") for i in range(25)],
        "doc_id long, text string",
    )
    new = minhash_signatures(docs)
    toks = docs.select("doc_id", F.split("text", " ").alias("__t")).select(
        "doc_id", F.expr(_token_hash_expr("__t")).alias("__th")
    )
    exploded = toks.select(
        "doc_id", F.explode(F.expr(_shingle_hash_expr("__th"))).alias("__s")
    )
    old = (
        exploded.groupBy("doc_id")
        .agg(
            *[
                F.min(F.xxhash64(F.lit(seed), F.col("__s"))).alias(f"__h{seed}")
                for seed in range(N_HASHES)
            ]
        )
        .select(
            "doc_id",
            F.array(*[f"__h{seed}" for seed in range(N_HASHES)]).alias("sig"),
        )
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_simhash_single_expr_agg_matches_per_bit_column_tree(spark):
    """r13 opt round (continuation): simhash builds its 64 per-bit vote
    aggregates as ONE parsed SQL array expression (plan-construction
    cost, guide §7.3 — the E3.1 minhash lever applied to the l2c/l40
    path). This pins that the parsed form is bit-identical to the
    per-bit Column tree it replaced: SQL ``CASE WHEN ((h >> j) & 1) = 1
    THEN 1 ELSE -1 END`` must parse to the same int-literal CaseWhen
    ``F.when(...).otherwise(-1)`` built, or packed signatures silently
    shift."""
    docs = spark.createDataFrame(
        [(i, f"tok{i} a b c d e f g h{i} j k") for i in range(25)]
        + [(100, "solo")],
        "doc_id long, text string",
    )
    new = simhash(docs)
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(64)
    ]
    packed = " | ".join(
        f"(CAST(CASE WHEN b{j} > 0 THEN 1 ELSE 0 END AS BIGINT) << {j})"
        for j in range(64)
    )
    old = (
        toks.groupBy("doc_id")
        .agg(*votes)
        .select("doc_id", F.expr(packed).alias("simhash"))
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_simhash_identical_and_near(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " tokX"
    far = " ".join(f"zzz{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)], "doc_id long, text string"
    )
    out = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert out[1] == out[2]
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(out[1], out[3]) < ham(out[1], out[4])


def test_lsh_ann_recall_on_testdata(spark):
    """ANN candidates for identical vector must include exact top match."""
    from lens_warehouse_spark.llm.vector import lsh_bucket

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("bucket", lsh_bucket("embedding"))
    )
    # a vector is always in its own bucket (sanity of bucket determinism)
    n_buckets = emb.select("bucket").distinct().count()
    assert 1 <= n_buckets <= 256
    twice = emb.select("vec_id", "bucket").join(
        emb.select(F.col("vec_id").alias("v2"), F.col("bucket").alias("b2")),
        F.col("vec_id") == F.col("v2"),
    )
    assert twice.filter(F.col("bucket") != F.col("b2")).count() == 0


def test_connected_components_chain_and_singletons(spark):
    from lens_warehouse_spark.llm.dedup import neardup_components

    # chain 1-2-3-4, pair (10,11), singletons 20,21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    ids = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20, 21]], "doc_id long"
    )
    out = {r.doc_id: r.canonical_id for r in neardup_components(pairs, ids).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 21}


def test_connected_components_deep_chain_converges(spark):
    """A 40-node chain (diameter 39) must fully converge well inside
    max_iters=10 — pointer-jumping makes convergence O(log d); plain
    one-hop propagation would need 39 iterations and silently return a
    split cluster."""
    from lens_warehouse_spark.llm.dedup import neardup_components

    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    out = {r.doc_id: r.canonical_id for r in neardup_components(pairs, ids).collect()}
    assert out == {i: 0 for i in range(n)}


def test_connected_components_nonconvergence_raises(spark):
    """max_iters too small for the graph must raise, never return
    silently-wrong components."""
    import pytest as _pytest

    from lens_warehouse_spark.llm.dedup import neardup_components

    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        neardup_components(pairs, ids, max_iters=1)


def test_deterministic_sample_rate_is_close(spark):
    """md5-bucket sampling hits the requested rate within binomial noise."""
    from lens_warehouse_spark import registry

    registry.load_all()
    total = 500
    sampled = (
        registry.QUERIES["l11_deterministic_sample"](spark, "/root/testdata/sf0.001")
        .agg({"n_sampled": "sum"})
        .collect()[0][0]
    )
    # 20% of 500 = 100; 4 sigma of binomial(500, .2) ~ 36
    assert abs(sampled - 0.2 * total) < 40, sampled


def test_plan_lsh_curve_placement():
    from lens_warehouse_spark.llm.dedup import plan_lsh

    for n_hashes in (16, 32, 64):
        prev_bands = None
        for threshold in (0.3, 0.5, 0.7, 0.9):
            b, r = plan_lsh(threshold, n_hashes)
            assert b * r == n_hashes
            t = (1.0 / b) ** (1.0 / r)
            # curve threshold lands near (biased below) the request
            assert t <= threshold + 0.15, (n_hashes, threshold, b, r, t)
            # monotone: higher threshold -> no more bands (longer rows)
            if prev_bands is not None:
                assert b <= prev_bands, (n_hashes, threshold)
            prev_bands = b


def test_threshold_pipeline_superset_of_default(spark):
    """At a lower threshold the thresholded pipeline must return a
    superset of the default 0.7 pipeline's pairs (recall monotonicity)."""
    from lens_warehouse_spark.catalog import table
    from lens_warehouse_spark.llm.dedup import l2_minhash_neardup, minhash_neardup

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    low = {
        (r.doc_a, r.doc_b)
        for r in minhash_neardup(docs, threshold=0.5).collect()
    }
    default = {
        (r.doc_a, r.doc_b)
        for r in l2_minhash_neardup(spark, "/root/testdata/sf0.001").collect()
    }
    assert default <= low


def test_simhash_band_pigeonhole_recall(spark):
    """Manku banding guarantee: ANY pair within hamming distance 3 of a
    64-bit fingerprint agrees exactly on >= 1 of the 4 16-bit bands and
    MUST appear as a candidate — this is deterministic pigeonhole, not
    an S-curve."""
    import random

    from lens_warehouse_spark.llm.dedup import simhash_band_candidates

    rng = random.Random(11)
    base = rng.getrandbits(64) - (1 << 63)
    rows = [(0, base)]
    # 20 mutants at hamming 1..3 from base (must ALL be found vs doc 0)
    for i in range(1, 21):
        m = base
        for bit in rng.sample(range(64), rng.randint(1, 3)):
            m ^= 1 << bit
        if m >= 1 << 63:
            m -= 1 << 64
        rows.append((i, m))
    # 30 random fingerprints (overwhelmingly far from base)
    for i in range(21, 51):
        rows.append((i, rng.getrandbits(64) - (1 << 63)))
    sh = spark.createDataFrame(rows, "doc_id long, simhash long")
    cands = {
        (r.doc_a, r.doc_b)
        for r in simhash_band_candidates(sh).collect()
    }
    for i in range(1, 21):
        assert (0, i) in cands, f"hamming<=3 mutant {i} missed"


def test_l40_simhash_neardup_on_planted(spark, tmp_path_factory):
    """End-to-end: near-identical docs land within the hamming
    threshold; unrelated docs do not pair with them."""
    import os

    from lens_warehouse_spark import registry

    registry.load_all()
    d = tmp_path_factory.mktemp("l40_sf")
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(59)) + " tokX"
    far = " ".join(f"zzz{i}" for i in range(60))
    rows = [
        (1, base, "en", "web", len(base)),
        (2, base, "en", "web", len(base)),
        (3, near, "en", "web", len(near)),
        (4, far, "en", "web", len(far)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    out = {
        (r.doc_a, r.doc_b): r.hamming
        for r in registry.QUERIES["l40_simhash_neardup"](spark, str(d)).collect()
    }
    assert out.get((1, 2)) == 0  # identical docs: hamming 0
    assert all(4 not in pair for pair in out)  # far doc never pairs


def test_simhash_wide_band_pigeonhole_recall(spark):
    """WIDE mode (Manku's 6-block / C(6,3)=20 combination tables for
    large corpora): 3 differing bits corrupt at most 3 of the 6 blocks,
    so the combo keyed on the 3 intact blocks matches — every pair
    within hamming 3 MUST still be a candidate."""
    import random

    from lens_warehouse_spark.llm.dedup import simhash_band_candidates

    rng = random.Random(13)
    base = rng.getrandbits(64) - (1 << 63)
    rows = [(0, base)]
    for i in range(1, 21):
        m = base
        for bit in rng.sample(range(64), rng.randint(1, 3)):
            m ^= 1 << bit
        if m >= 1 << 63:
            m -= 1 << 64
        rows.append((i, m))
    for i in range(21, 51):
        rows.append((i, rng.getrandbits(64) - (1 << 63)))
    sh = spark.createDataFrame(rows, "doc_id long, simhash long")
    cands = {
        (r.doc_a, r.doc_b)
        for r in simhash_band_candidates(sh, wide=True).collect()
    }
    for i in range(1, 21):
        assert (0, i) in cands, f"hamming<=3 mutant {i} missed in wide mode"


def test_simhash_wide_splits_skewed_bucket(spark):
    """The round-5 verdict's scale finding: narrow mode's 2^16 buckets
    make a planted skewed bucket quadratic. Plant N docs sharing one
    16-bit band value but far apart elsewhere: narrow mode emits all
    N*(N-1)/2 candidate pairs from that bucket; wide mode's ~32-bit
    combo keys keep the far-apart docs in separate buckets and must
    emit strictly fewer candidates. Final outputs stay equal (both are
    supersets of the true <=3 set and the hamming filter decides)."""
    import random

    from pyspark.sql import functions as F

    from lens_warehouse_spark.llm.dedup import simhash_band_candidates

    rng = random.Random(17)
    n = 60
    shared_low16 = rng.getrandbits(16)
    rows = []
    for i in range(n):
        # same band 0 (bits 0..15), random everywhere else -> one
        # narrow bucket, expected hamming ~24 between members
        high = rng.getrandbits(48)
        v = (high << 16) | shared_low16
        if v >= 1 << 63:
            v -= 1 << 64
        rows.append((i, v))
    sh = spark.createDataFrame(rows, "doc_id long, simhash long")
    narrow = simhash_band_candidates(sh, wide=False).count()
    wide = simhash_band_candidates(sh, wide=True).count()
    assert narrow == n * (n - 1) // 2  # the whole bucket pairs up
    assert wide < narrow / 10  # wide keys split the skewed bucket

    # Mode equivalence on the FINAL output: apply the hamming verify to
    # both candidate sets — identical survivors.
    def survivors(wide_mode):
        c = simhash_band_candidates(sh, wide=wide_mode)
        a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
        b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
        return {
            (r.doc_a, r.doc_b)
            for r in c.join(a, "doc_a")
            .join(b, "doc_b")
            .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
            .collect()
        }

    assert survivors(False) == survivors(True)


def test_lsh_recall_band_near_threshold(spark):
    """Threshold-REGIME recall guard (round-6 advisor): the planted
    fixture was tightened to mutate=1 (shingle jaccard ~0.85+), which
    left the 4x4 banding's ~0.71 S-curve crossover untested — a recall
    regression near the threshold would go unnoticed. Plant pairs, keep
    only those whose TRUE 3-token-shingle jaccard lands in the
    [0.60, 0.80] band, and assert pooled recall across seeds stays in a
    statistical band (the S-curve predicts ~0.42 at j=0.60 rising to
    ~0.88 at j=0.80; >= 40% pooled is the floor the construction is
    entitled to). Deterministic seeds — a failure is a code change, not
    noise."""
    recalled, total = 0, 0
    for seed in (3, 11, 19, 27, 35):
        rng = random.Random(seed)
        rows = [
            (i, " ".join(rng.choice(VOCAB) for _ in range(40)))
            for i in range(8)
        ]
        band_pairs = []
        for i in range(8):
            toks = rows[i][1].split(" ")
            mutated = list(toks)
            for _ in range(rng.choice((2, 3))):
                mutated[rng.randrange(len(mutated))] = rng.choice(VOCAB)
            rows.append((1000 + i, " ".join(mutated)))
            sh_a = {tuple(toks[j : j + 3]) for j in range(len(toks) - 2)}
            sh_b = {
                tuple(mutated[j : j + 3]) for j in range(len(mutated) - 2)
            }
            jac = len(sh_a & sh_b) / len(sh_a | sh_b)
            if 0.60 <= jac <= 0.80:
                band_pairs.append((i, 1000 + i))
        if not band_pairs:
            continue
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        sigs = minhash_signatures(docs).select("doc_id", "sig")
        found = {
            (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs).collect()
        }
        total += len(band_pairs)
        recalled += sum(p in found for p in band_pairs)
    assert total >= 10, f"fixture drift: only {total} band pairs planted"
    assert recalled / total >= 0.40, (
        f"threshold-band recall {recalled}/{total} below the S-curve floor"
    )
