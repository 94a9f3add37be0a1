"""Operator tests: dedup (exact, minhash-LSH recall), simhash,
similarity (IVF recall vs brute force), multimodal plumbing.
All at sf0.001 for speed; exact SQL-parity is covered by
tools/check_queries.py (driver-mimic) at sf0.01."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_exact_dedup_groups(spark):
    from opencv_table_extraction_spark.operators.dedup import exact_dedup

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    out = exact_dedup(corpus)
    rows = out.collect()
    n_docs = d.count()
    assert len(rows) == n_docs           # one group per distinct text
    assert all(r["n_copies"] == 2 for r in rows)
    assert all(r["keeper_id"] < 1_000_000 for r in rows)  # keeper = min id


def test_minhash_lsh_finds_all_near_dups(spark):
    """Every doc's 90%-truncation must surface as a candidate pair and
    survive exact-Jaccard verification (recall check: LSH with 16 bands
    x 2 rows has ~0.99+ recall at jaccard ~0.87)."""
    from opencv_table_extraction_spark.operators.dedup import (
        dedup_corpus,
        minhash_lsh_pairs,
    )

    corpus = dedup_corpus(spark, SF)
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"]
             for r in minhash_lsh_pairs(corpus).collect()}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    planted = [(i, i + 1_000_000) for i in range(n_docs)]
    found = [p for p in planted if p in pairs]
    assert len(found) >= 0.98 * n_docs
    assert all(pairs[p] >= 0.5 for p in found)


def test_containment_finds_planted_subsumptions(spark):
    """Asymmetric containment: every truncated twin is a SUBSET of its
    base doc's shingles, so (twin, base) must surface at containment
    1.0 — the doc-inside-doc case symmetric Jaccard under-scores. The
    reverse (base, twin) direction sits at ~0.9 and also clears t=0.8.
    Also pins the ordered-pair contract (a_id = contained side) and the
    no-drops exactness guarantee on this corpus."""
    from opencv_table_extraction_spark.operators.dedup import (
        containment_pairs_with_drops,
        dedup_corpus,
    )

    corpus = dedup_corpus(spark, SF)
    pairs, dropped = containment_pairs_with_drops(corpus)
    assert dropped.count() == 0  # exactness holds: nothing excluded
    got = {(r["a_id"], r["b_id"]): r["containment"] for r in pairs.collect()}
    rows = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()

    def grams(text):
        toks = text.strip(" ").split()
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))}

    for r in rows:
        i = r["doc_id"]
        assert got.get((i + 1_000_000, i)) == 1.0  # twin fully in base
        # reverse direction (base in twin): tokens drop 10% but SHORT
        # docs can lose >20% of their distinct shingles, so compute the
        # truth per doc and require exact agreement either way
        toks = r["text"].strip(" ").split()
        twin = grams(" ".join(toks[: int(len(toks) * 0.9)]))
        base = grams(r["text"])
        truth = len(base & twin) / len(base)
        if truth >= 0.8:
            assert (i, i + 1_000_000) in got
        else:
            assert (i, i + 1_000_000) not in got


def test_minhash_band_scaling_keeps_two_row_bands(spark):
    """n_bands=32 must scale n_hashes to 64 (2-row bands), not degrade
    to 32 single-row bands (the r6 sf1-sweep finding: 32x1 is
    perfect-recall but ~8x wall because every J-similar pair becomes a
    candidate). Pin: band rows per doc = n_bands in both configs, and
    the 32x2 pair set is a superset of the 16x2 set on the test corpus
    (higher recall, identical verify threshold)."""
    from opencv_table_extraction_spark.operators.dedup import (
        dedup_corpus,
        minhash_band_rows,
        minhash_lsh_pairs,
    )

    corpus = dedup_corpus(spark, SF)
    docs = corpus.select("doc_id", "text").limit(5)
    for nb in (16, 32):
        per_doc = (
            minhash_band_rows(docs, n_hashes=2 * nb, n_bands=nb)
            .groupBy("doc_id").count().collect()
        )
        assert per_doc and all(r["count"] == nb for r in per_doc)

    p16 = {(r["a_id"], r["b_id"]) for r in minhash_lsh_pairs(corpus).collect()}
    p32 = {(r["a_id"], r["b_id"])
           for r in minhash_lsh_pairs(corpus, n_bands=32).collect()}
    assert p16 <= p32


def test_lsh_recall_profiles(spark):
    """recall="standard"|"high" is the named form of the measured
    banding tradeoff (r6 verdict #5): high must resolve to exactly the
    32x2 configuration, unknown/conflicting arguments must fail fast,
    and the crosscheck accepts the profile so the high-profile
    generator can be measured against exact PPJoin truth."""
    from opencv_table_extraction_spark.operators.dedup import (
        RECALL_PROFILES,
        dedup_corpus,
        minhash_lsh_pairs,
        pairs_crosscheck,
    )

    assert RECALL_PROFILES == {"standard": (16, 32), "high": (32, 64)}
    corpus = dedup_corpus(spark, SF)
    with pytest.raises(ValueError, match="unknown recall profile"):
        minhash_lsh_pairs(corpus, recall="maximum")
    with pytest.raises(ValueError, match="not both"):
        minhash_lsh_pairs(corpus, recall="high", n_bands=32)

    hi = {(r["a_id"], r["b_id"])
          for r in minhash_lsh_pairs(corpus, recall="high").collect()}
    explicit = {(r["a_id"], r["b_id"])
                for r in minhash_lsh_pairs(corpus, n_bands=32).collect()}
    std = {(r["a_id"], r["b_id"])
           for r in minhash_lsh_pairs(corpus, recall="standard").collect()}
    assert hi == explicit and std <= hi

    r = pairs_crosscheck(corpus, recall="high").collect()[0]
    assert r["n_symmetric_diff"] == 0
    assert r["n_dropped_lsh"] == 0 and r["n_dropped_prefix"] == 0


def test_minhash_family_collision_rate_tracks_jaccard():
    """Statistical pin on the hash family: (1) per-hash collision rate
    = shingle Jaccard on real doc pairs (Broder unbiasedness), and
    (2) — the part that actually discriminates — CROSS-HASH
    INDEPENDENCE: for fixed values u != v, the indicators
    [hash_i(u) < hash_i(v)] across the 32 functions must look like 32
    fair independent coins, i.e. extreme win fractions (<=4/32 or
    >=28/32) occur at Binomial(32, 1/2) tail rates (~2e-6 per side).
    The r6 sf1 sweep found the previous linear-Weyl affine family
    violating (2): its win sequence is a correlated rotation, measured
    1.1% extreme value pairs on this exact fixture — 5,000x over
    binomial — which is precisely how one unlucky non-shared shingle
    wins the min in nearly every function and costs a J~0.85 pair
    (9/102,615 true pairs missed). The old family PASSES check (1) on
    average-case docs, so (2) is the regression gate. Deterministic
    given the fixed rng seeds and the fixed keyed-splitmix64 family —
    a regression flips it red, not flaky. Raw per-hash signatures are
    recovered by running the band kernel with n_bands == n_hashes
    (1-row bands fold to the signature itself). No Spark session
    needed: the kernel is a plain Arrow-batch generator."""
    import numpy as np
    import pyarrow as pa

    from opencv_table_extraction_spark.operators.dedup import (
        _jvm_tokens,
        _minhash_band_batches,
    )

    rng = np.random.default_rng(20260817)
    vocab = [f"w{i:03d}" for i in range(400)]
    n_pairs, doc_len, n_h = 60, 80, 32
    docs, pair_js = [], []
    for p in range(n_pairs):
        toks = [str(w) for w in rng.choice(vocab, size=doc_len)]
        cut = int(rng.integers(4, 41))  # tail-truncate -> J ~ 0.5-0.95
        a, b = " ".join(toks), " ".join(toks[: doc_len - cut])
        docs += [(2 * p, a), (2 * p + 1, b)]

        def shingles(text):
            ts = _jvm_tokens(text)
            return {tuple(ts[i : i + 3]) for i in range(len(ts) - 2)}

        sa, sb = shingles(a), shingles(b)
        pair_js.append(len(sa & sb) / len(sa | sb))

    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([d for d, _ in docs], type=pa.int64()),
            pa.array([t for _, t in docs]),
        ],
        names=["doc_id", "text"],
    )
    sigs: dict[int, list[int]] = {}
    for out in _minhash_band_batches([batch], n_hashes=n_h, n_bands=n_h):
        d = out.to_pydict()
        for doc, sig in zip(d["doc_id"], d["band_hash"]):
            sigs.setdefault(doc, []).append(sig)

    gaps = []
    for p, j in enumerate(pair_js):
        a_sig = np.asarray(sigs[2 * p])
        b_sig = np.asarray(sigs[2 * p + 1])
        assert len(a_sig) == n_h and len(b_sig) == n_h
        frac = float((a_sig == b_sig).mean())
        gaps.append(frac - j)
        # the r6 defect shape: a high-J pair almost never colliding.
        # Binomial(32, 0.8) puts <=16 collisions at ~2e-4 — and the
        # check is deterministic for this fixed seed + family.
        if j >= 0.8:
            assert frac > 0.5, (j, frac)
    # unbiasedness across the J~0.5-0.95 sweep: |mean(frac - J)| over
    # 60 pairs x 32 hashes (se ~ 0.011) must sit near zero
    assert abs(float(np.mean(gaps))) < 0.05, np.mean(gaps)

    # (2) cross-hash independence on raw 64-bit values — the
    # discriminating check. Recompute the family exactly as the kernel
    # does (keys = splitmix64(splitmix64(i+1))) and count value pairs
    # whose win fraction lands in the <=4/32 or >=28/32 tails.
    def _splitmix64(z):
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    with np.errstate(over="ignore"):
        keys = _splitmix64(
            _splitmix64(np.arange(1, n_h + 1, dtype=np.uint64))
        ).reshape(-1, 1)
        rng2 = np.random.default_rng(7)
        u = rng2.integers(0, 2**63, size=4000, dtype=np.uint64)
        v = rng2.integers(0, 2**63, size=4000, dtype=np.uint64)
        wins = (_splitmix64(u[None, :] ^ keys)
                < _splitmix64(v[None, :] ^ keys)).mean(axis=0)
    # fair-coin dispersion: sd ~ sqrt(1/(4*32)) = 0.088
    assert abs(float(wins.std()) - 0.088) < 0.02, wins.std()
    # binomial tails put ~2e-6 mass per side -> expect 0 of 4,000;
    # the Weyl family measured 43/4,000 (1.1%) on these exact draws
    n_extreme = int(((wins <= 4 / 32) | (wins >= 28 / 32)).sum())
    assert n_extreme == 0, n_extreme


def test_simhash_deterministic_and_discriminative(spark):
    from opencv_table_extraction_spark.operators.dedup import simhash60

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    h1 = {r["doc_id"]: r["h"] for r in d.select("doc_id", simhash60("text").alias("h")).collect()}
    h2 = {r["doc_id"]: r["h"] for r in d.select("doc_id", simhash60("text").alias("h")).collect()}
    assert h1 == h2
    assert all(0 <= v < (1 << 60) for v in h1.values())  # 60-bit, positive
    # near-identical docs must land at small hamming distance,
    # unrelated docs far: check doc vs its truncation
    rows = d.orderBy("doc_id").limit(5).collect()
    for r in rows:
        toks = r["text"].split()
        trunc = " ".join(toks[: int(len(toks) * 0.9)])
        a = spark.createDataFrame([(r["text"],), (trunc,)], ["text"])
        ha, hb = [x["h"] for x in a.select(simhash60("text").alias("h")).collect()]
        ham = bin(ha ^ hb).count("1")
        assert ham <= 14, (r["doc_id"], ham)


def test_simhash_pairs_find_planted_near_dups(spark):
    from opencv_table_extraction_spark.operators.dedup import (
        dedup_corpus,
        simhash_pairs,
    )

    # max_hamming=14 = n_chunks-1: the pigeonhole recall guarantee bound
    pairs = {(r["a_id"], r["b_id"]): r["hamming"]
             for r in simhash_pairs(dedup_corpus(spark, SF), max_hamming=14).collect()}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    planted = [(i, i + 1_000_000) for i in range(n_docs)]
    found = [p for p in planted if p in pairs]
    # 90%-token-overlap docs land within small hamming of each other
    assert len(found) >= 0.9 * n_docs
    assert all(h <= 14 for h in pairs.values())


def test_jaccard_block_guard_raises_on_hot_block(spark):
    """The brute-force block join must fail fast on a cartesian-bomb
    block instead of silently launching a quadratic job."""
    import pytest as _pytest

    from opencv_table_extraction_spark.operators.dedup import jaccard_pairs

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    hot = d.withColumn("source", F.lit("one-hot-shard"))
    with _pytest.raises(ValueError, match="one-hot-shard"):
        jaccard_pairs(hot, max_block=50)
    # under the cap it runs
    ok = d.limit(40).withColumn("source", F.lit("one-hot-shard"))
    jaccard_pairs(ok, max_block=50).count()


def test_jaccard_prefix_join_exact_vs_bruteforce(spark):
    """Prefix filtering must find EXACTLY the pairs the quadratic
    baseline finds at the same threshold (the no-false-negatives
    theorem, end to end)."""
    from opencv_table_extraction_spark.operators.dedup import (
        dedup_corpus,
        jaccard_pairs,
        jaccard_prefix_pairs,
    )

    corpus = dedup_corpus(spark, SF).withColumn("source", F.lit("all"))
    brute = {(r["a_id"], r["b_id"]): r["jaccard"]
             for r in jaccard_pairs(corpus, threshold=0.5).collect()}
    pref = {(r["a_id"], r["b_id"]): r["jaccard"]
            for r in jaccard_prefix_pairs(corpus, threshold=0.5).collect()}
    assert set(pref) == set(brute)
    assert all(abs(pref[k] - brute[k]) < 1e-9 for k in pref)


def test_embedding_cosine_pairs_finds_planted(spark):
    """SRP-LSH must surface the planted (i, i+1M) truncation pairs whose
    exact cosine clears the threshold — candidate recall through the
    16x4-bit pigeonhole banding, verified end to end."""
    from opencv_table_extraction_spark.operators.dedup import (
        EMB_COS_THRESHOLD,
        embedding_corpus,
        embedding_cosine_pairs,
    )
    from opencv_table_extraction_spark.operators.similarity import cosine

    corpus = embedding_corpus(spark, SF)
    pairs = {(r["a_id"], r["b_id"]): r["cos"]
             for r in embedding_cosine_pairs(corpus).collect()}
    # ground truth for the planted family only (cheap: n rows, not n^2)
    a = corpus.where(F.col("vec_id") < 1_000_000).select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("a_v"))
    b = corpus.where(F.col("vec_id") >= 1_000_000).select(
        (F.col("vec_id") - 1_000_000).alias("a_id"), F.col("v").alias("b_v"))
    truth = {
        r["a_id"]: r["c"]
        for r in a.join(b, "a_id")
        .select("a_id", F.round(cosine(F.col("a_v"), F.col("b_v")), 4).alias("c"))
        .collect()
    }
    expected = {i for i, c in truth.items() if c >= EMB_COS_THRESHOLD}
    assert expected, "corpus should plant qualifying pairs"
    found = {i for (i, j) in pairs if j == i + 1_000_000}
    assert expected <= found
    assert all(pairs[(i, i + 1_000_000)] == truth[i] for i in expected)


def test_multimodal_oracle_ascii_assumption(spark):
    """The frame/meta DuckDB oracles slice characters and pin the
    octet-stream kind; both are valid only while the corpus is pure
    ASCII with no sniffable magic prefix — pin that here."""
    from opencv_table_extraction_spark.operators.multimodal import sniff_kind

    d = spark.read.parquet(f"{SF}/documents.parquet")
    non_ascii = d.where(
        F.octet_length(F.encode("text", "utf-8")) != F.length("text")
    ).count()
    assert non_ascii == 0
    kinds = {sniff_kind(r["text"].encode()) for r in d.select("text").collect()}
    assert kinds == {"application/octet-stream"}


def test_recognizer_seam_is_pluggable():
    from opencv_table_extraction_spark.kernel.router import Recognizer, transcribe

    class Upper(Recognizer):
        def handwriting(self, t):
            return t.upper()

        def ocr(self, t):
            return t.lower()

    assert transcribe("handwriting", "MiXeD", Upper()) == "MIXED"
    assert transcribe("ocr", "MiXeD", Upper()) == "mixed"
    assert transcribe("ocr", " pad ") == "pad"  # default stub


def test_ivf_search_recall_vs_bruteforce(spark):
    from opencv_table_extraction_spark.operators.similarity import (
        _q_embedding_topk,
        ivf_search,
    )

    brute = [r["vec_id"] for r in _q_embedding_topk(spark, SF).collect()]
    approx = [r["vec_id"] for r in ivf_search(spark, SF, n_probe=4).collect()]
    overlap = len(set(brute) & set(approx)) / len(brute)
    assert overlap >= 0.5, (brute, approx)  # n_probe=4 of 8 buckets


def test_multimodal_meta_and_stub(spark):
    from opencv_table_extraction_spark.operators.multimodal import (
        _q_multimodal_meta,
        decode_image,
        sniff_kind,
    )

    rows = _q_multimodal_meta(spark, SF).collect()
    assert all(r["n_bytes"] > 0 for r in rows)
    assert all(r["kind"] == "application/octet-stream" for r in rows)
    assert sniff_kind(b"\x89PNG\r\n") == "image/png"
    assert sniff_kind(b"\xff\xd8\xff\xe0") == "image/jpeg"
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG....")


def test_hot_bucket_cap_drops_degenerate_family(spark):
    """One degenerate key family (N identical texts) must not reach pair
    enumeration: the count-first cap excludes its buckets BEFORE any
    collect_list materializes them, the job completes, and the drop is
    surfaced on the _with_drops form's dropped frame (VERDICT r2 #2)."""
    from opencv_table_extraction_spark.operators.dedup import (
        jaccard_prefix_pairs_with_drops,
        minhash_lsh_pairs_with_drops,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    base = d.limit(30)
    clone_text = d.orderBy("doc_id").limit(1).collect()[0]["text"]
    clones = spark.range(30).select(
        (F.col("id") + 2_000_000).alias("doc_id"), F.lit(clone_text).alias("text")
    )
    corpus = base.unionByName(clones)

    capped, cdrops = minhash_lsh_pairs_with_drops(corpus, max_bucket=10)
    pairs = {(r["a_id"], r["b_id"]) for r in capped.collect()}
    # the clone family's buckets (31 ids each) were excluded wholesale
    assert not any(a >= 2_000_000 and b >= 2_000_000 for a, b in pairs)
    drops = cdrops.collect()
    assert drops and all(r["n"] > 10 for r in drops)

    # under the default cap the same family enumerates normally
    full, fdrops = minhash_lsh_pairs_with_drops(corpus)
    full_pairs = {(r["a_id"], r["b_id"]) for r in full.collect()}
    assert (2_000_000, 2_000_001) in full_pairs
    assert fdrops.count() == 0

    # prefix join: same contract (clone docs share every prefix shingle)
    pcapped, pdrops = jaccard_prefix_pairs_with_drops(corpus, max_bucket=10)
    ppairs = {(r["a_id"], r["b_id"]) for r in pcapped.collect()}
    assert not any(a >= 2_000_000 and b >= 2_000_000 for a, b in ppairs)
    assert pdrops.count() > 0


def test_srp_bucket_cap_drops_degenerate_family(spark):
    """Same cap contract for the SRP embedding dedup: N copies of one
    vector collide in all 16 chunks; capped they are excluded and
    reported, never pair-expanded."""
    from opencv_table_extraction_spark.operators.dedup import (
        embedding_corpus,
        embedding_cosine_pairs_with_drops,
    )

    corpus = embedding_corpus(spark, SF).where(F.col("vec_id") < 30)
    v0 = corpus.orderBy("vec_id").limit(1).collect()[0]["v"]
    clones = spark.range(30).select(
        (F.col("id") + 2_000_000).alias("vec_id"),
        F.array(*[F.lit(float(x)) for x in v0]).alias("v"),
    )
    big = corpus.unionByName(clones)
    capped, cdrops = embedding_cosine_pairs_with_drops(big, max_bucket=10)
    pairs = {(r["a_id"], r["b_id"]) for r in capped.collect()}
    assert not any(a >= 2_000_000 and b >= 2_000_000 for a, b in pairs)
    assert cdrops.count() > 0


def test_simhash_scale_banding_candidates_grow_linearly(spark):
    """The (radius 3, 4x15-bit) scale banding must generate ~linear
    candidates while the (radius 12, 15x4-bit) exactness mode is
    Theta(N^2) by construction (1/16 chunk collision odds) — the r2
    verdict's #1 scale fix, asserted at two corpus sizes."""
    from opencv_table_extraction_spark.operators.dedup import (
        SIMHASH_SCALE_CHUNKS,
        simhash_candidate_pairs,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")

    def planted(n):
        base = d.where(F.col("doc_id") < n)
        toks = F.split(F.trim("text"), r"\s+")
        trunc = F.array_join(
            F.slice(toks, 1, F.floor(F.size(toks) * 0.9).cast("int")), " "
        )
        return base.unionByName(
            base.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                        trunc.alias("text"))
        )

    a, b = planted(100), planted(200)   # 200 vs 400 docs
    sc_a = simhash_candidate_pairs(a, SIMHASH_SCALE_CHUNKS).count()
    sc_b = simhash_candidate_pairs(b, SIMHASH_SCALE_CHUNKS).count()
    ex_a = simhash_candidate_pairs(a, 15).count()
    ex_b = simhash_candidate_pairs(b, 15).count()
    ap_a, ap_b = 200 * 199 / 2, 400 * 399 / 2
    # scale mode: candidates << N^2 at both sizes, and the candidate
    # FRACTION of all-pairs falls as N grows (sub-quadratic). Measured
    # here: 554/19900 (2.8%) -> 1817/79800 (2.3%); growth is not purely
    # linear on THIS corpus only because the synthetic word salad is
    # pathologically self-similar (6.6% of random pairs sit within
    # hamming 12 of 60) — still a 34-42x candidate reduction.
    assert sc_a < 0.05 * ap_a, sc_a
    assert sc_b < 0.05 * ap_b, sc_b
    assert sc_b / ap_b < sc_a / ap_a, (sc_a, sc_b)
    # exactness mode: essentially ALL pairs are candidates regardless of
    # N (1/16 chunk-collision odds) — the Theta(N^2) contrast
    assert ex_a > 0.8 * ap_a and ex_b > 0.8 * ap_b, (ex_a, ex_b)
    assert ex_b >= 3 * ex_a, (ex_a, ex_b)
    # and the scale config beats it by >10x at both sizes
    assert ex_a > 10 * sc_a and ex_b > 10 * sc_b


def test_simhash_kernel_matches_expression(spark):
    """The Arrow simhash kernel (the pairs operators' fast path) must be
    bit-equal to the pure JVM md5 expression (the oracle-certified
    dedup_simhash query) on the corpus AND on edge inputs (empty text,
    edge whitespace, repeated tokens — votes count occurrences)."""
    from opencv_table_extraction_spark.operators.dedup import (
        simhash60,
        simhash_rows,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    edge = spark.createDataFrame(
        [(9001, ""), (9002, "\tTab  Edge\n"), (9003, "dup dup dup x"),
         (9004, "MiXeD Case"), (9005, "one")],
        ["doc_id", "text"],
    )
    corpus = d.unionByName(edge)
    expr = {r["doc_id"]: r["h"]
            for r in corpus.select("doc_id", simhash60("text").alias("h")).collect()}
    kern = {r["doc_id"]: r["sh"] for r in simhash_rows(corpus).collect()}
    assert kern == expr


def test_simhash_pairs_rejects_unsound_banding(spark):
    import pytest as _pytest

    from opencv_table_extraction_spark.operators.dedup import (
        dedup_corpus,
        simhash_pairs,
    )

    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(dedup_corpus(spark, SF), max_hamming=5, n_chunks=4)


def test_python_kernels_tokenize_like_jvm_on_edge_whitespace(spark):
    """_jvm_tokens must agree with the JVM split(trim(col), '\\s+') on
    texts edged with tabs/newlines (the r2 ADVICE divergence: Python
    .strip().split() strips ALL whitespace, Spark trim strips spaces
    only)."""
    from opencv_table_extraction_spark.operators.dedup import _jvm_tokens

    texts = ["\tfoo bar baz", "foo bar baz\n", " a\tb  c d ", "", "x",
             "\n\t lead", "trail \t\n", "  spaced  ", "ab"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    jvm = [r["t"] for r in
           df.select(F.split(F.trim("text"), r"\s+").alias("t")).collect()]
    for t, expect in zip(texts, jvm):
        assert _jvm_tokens(t) == expect, (repr(t), _jvm_tokens(t), expect)


def test_corpus_whitespace_is_pinned_for_oracles(spark):
    """The DuckDB oracles and the Python kernels agree on tokenization
    for any text whose edges are space-only and whose whitespace chars
    are ASCII \\s — pin that corpus invariant (like the multimodal ASCII
    pin) so a future corpus change that breaks it fails loudly here
    rather than as a silent oracle mismatch."""
    import re as _re

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = spark.read.parquet(f"{sf}/documents.parquet").select("text").collect()
        for r in rows:
            t = r["text"]
            assert not _re.match(r"^[\t\n\r\f\v]", t), repr(t[:20])
            assert not _re.search(r"[\t\n\r\f\v]$", t), repr(t[-20:])
            assert all(_re.match(r"[ \t\n\r\f\v]", ch) for ch in t if ch.isspace())


def test_decontaminate_flags_planted_contamination(spark):
    """Every planted truncation of an eval-set doc shares n-grams with
    it and must be flagged; eval docs themselves are never flagged; and
    the big corpus side must reach the eval-gram join via broadcast
    (the 10^12-row side never shuffles)."""
    from opencv_table_extraction_spark.operators.dedup import (
        EVAL_MOD,
        _q_decontaminate,
    )

    flags = _q_decontaminate(spark, SF)
    plan = flags._sc._jvm.PythonSQLUtils.explainString(
        flags._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    got = {r["doc_id"]: r["n_hits"] for r in flags.collect()}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    planted = {i + 1_000_000 for i in range(0, n_docs, EVAL_MOD)}
    assert planted <= set(got), planted - set(got)
    assert all(
        not (d % EVAL_MOD == 0 and d < 1_000_000) for d in got
    )
    assert all(h >= 1 for h in got.values())


def test_train_test_split_is_stable_under_corpus_growth(spark):
    """A doc's split must depend only on its id (hash-based), never on
    position or corpus size: the assignment over a half corpus equals
    the assignment over the full corpus restricted to it, and the split
    fractions land near 80/10/10."""
    from opencv_table_extraction_spark.operators.textstats import (
        _q_train_test_split,
    )

    full = {r["doc_id"]: r["split"]
            for r in _q_train_test_split(spark, SF).collect()}
    n = len(full)
    frac = {s: sum(1 for v in full.values() if v == s) / n
            for s in ("train", "val", "test")}
    assert 0.7 < frac["train"] < 0.9 and frac["val"] > 0.03 and frac["test"] > 0.03
    # restriction stability: recompute over an arbitrary subset
    import pyspark.sql.functions as _F

    sub = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(_F.col("doc_id") % 2 == 0)
    )
    from opencv_table_extraction_spark.operators import textstats as _ts

    bucket = (
        _F.conv(_F.substring(_F.md5(_F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    split = (_F.when(bucket < 80, "train").when(bucket < 90, "val")
             .otherwise("test"))
    sub_map = {r["doc_id"]: r["split"]
               for r in sub.select("doc_id", split.alias("split")).collect()}
    assert all(full[d] == s for d, s in sub_map.items())


def test_pack_token_shards_is_partition_invariant(spark):
    """The distributed prefix-sum packing must produce identical shard
    assignments at any partition count (3, 7, 32) and never a window
    spanning a whole source in one task — the global cumsum is exact
    regardless of how ranges split."""
    from opencv_table_extraction_spark.operators.textstats import (
        pack_token_shards,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    # small budget so shard boundaries land mid-source (exercises the
    # cross-partition offsets, not just shard 0)
    base = {(r["doc_id"]): (r["source"], r["shard_id"])
            for r in pack_token_shards(d, budget=300, partitions=3).collect()}
    assert len({v[1] for v in base.values()}) > 3  # multiple shards
    for p in (7, 32):
        got = {r["doc_id"]: (r["source"], r["shard_id"])
               for r in pack_token_shards(d, budget=300, partitions=p).collect()}
        assert got == base, p


def test_connected_components_multi_hop_chain(spark):
    """Min-label propagation must converge across multi-hop chains (a
    cluster connected only transitively), handle several disjoint
    clusters, and report exact sizes — beyond what single-round
    neighbor-min could do."""
    from opencv_table_extraction_spark.operators.dedup import (
        connected_components_pairs,
    )

    # chain 10-11-12-13-14 (diameter 4), pair (20,21), triangle 30-31-32
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 14),
         (20, 21),
         (30, 31), (31, 32), (30, 32)],
        ["a_id", "b_id"],
    )
    n_cached_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    rounds: list[int] = []
    got = {r["doc_id"]: (r["keeper_id"], r["cluster_size"])
           for r in connected_components_pairs(
               pairs, round_counter=rounds).collect()}
    assert {d: got[d] for d in (10, 11, 12, 13, 14)} == {
        d: (10, 5) for d in (10, 11, 12, 13, 14)}
    assert got[20] == (20, 2) and got[21] == (20, 2)
    assert all(got[d] == (30, 3) for d in (30, 31, 32))
    # the loop's per-round persists are all released; what may remain:
    # the returned frame's localCheckpoint blocks plus the per-round
    # truncation frames (one per round — RDD-level persists the
    # ContextCleaner frees on GC; DataFrame.unpersist cannot), bounded
    # by the round count the counter reports
    n_cached_after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert n_cached_after - n_cached_before <= rounds[0] + 1, (
        n_cached_before, n_cached_after, rounds)


def test_connected_components_raises_on_nonconvergence(spark):
    """A pair graph whose diameter exceeds the round budget must fail
    fast, never emit silently-split clusters with wrong keepers."""
    import pytest as _pytest

    from opencv_table_extraction_spark.operators.dedup import (
        connected_components_pairs,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 16)], ["a_id", "b_id"]
    )
    with _pytest.raises(RuntimeError, match="not converged"):
        connected_components_pairs(chain, max_iter=2)
    # and with budget >= diameter it converges fine
    got = {r["doc_id"]: r["keeper_id"]
           for r in connected_components_pairs(chain, max_iter=10).collect()}
    assert all(k == 10 for k in got.values())


def test_connected_components_auto_mode(spark):
    """mode='auto' = min-label for up to _AUTO_MINLABEL_ROUNDS, then a
    two-star fallback on the original pairs instead of the fail-fast.
    Dense graph: stays on the cheaper min-label (round_counter small).
    Chain beyond the budget: falls back and still produces the correct
    single cluster — never ComponentsNotConverged on diameter alone."""
    from opencv_table_extraction_spark.operators.dedup import (
        _AUTO_MINLABEL_ROUNDS,
        connected_components_pairs,
    )

    # dense star: diameter 2, min-label converges inside the budget
    dense = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], ["a_id", "b_id"]
    )
    rounds: list[int] = []
    got = {r["doc_id"]: r["keeper_id"]
           for r in connected_components_pairs(
               dense, mode="auto", round_counter=rounds).collect()}
    assert all(k == 0 for k in got.values()) and len(got) == 6
    assert rounds and rounds[0] <= _AUTO_MINLABEL_ROUNDS

    # chain of diameter 12 > budget 6: the old minlabel default raised;
    # auto must fall back to two-star and emit one correct cluster
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["a_id", "b_id"]
    )
    rounds2: list[int] = []
    got2 = {r["doc_id"]: (r["keeper_id"], r["cluster_size"])
            for r in connected_components_pairs(
                chain, max_iter=20, mode="auto",
                round_counter=rounds2).collect()}
    assert len(got2) == 13
    assert all(v == (0, 13) for v in got2.values())
    # the failed min-label attempt appends nothing; the single entry is
    # the two-star fallback's round count (O(log diameter))
    assert len(rounds2) == 1 and rounds2[0] <= 8, rounds2

    # r7/r8 frontier-decay bail: on a chain the changed-label count
    # decays ~one per round (12 -> 11 -> 10 ...), so with _bail_ratio
    # (and the frontier floor disabled) the min-label leg must give up
    # at round 2 — the earliest comparison — not burn the whole budget
    # (a COST assertion — auto's output above is already proven equal)
    import pytest
    from opencv_table_extraction_spark.operators.dedup import (
        _AUTO_BAIL_RATIO,
        ComponentsNotConverged,
    )

    with pytest.raises(ComponentsNotConverged) as ei:
        connected_components_pairs(
            chain, max_iter=20, mode="minlabel", _bail_ratio=_AUTO_BAIL_RATIO,
            _bail_min_frontier=0,
        )
    assert ei.value.rounds_used == 2
    # r8 (ADVICE): with the default _AUTO_BAIL_MIN_FRONTIER floor, a
    # frontier this small (12 changed labels) never bails — min-label
    # just converges (diameter < max_iter), no two-star detour
    ok_floor = connected_components_pairs(
        chain, max_iter=20, mode="minlabel", _bail_ratio=_AUTO_BAIL_RATIO
    )
    assert ok_floor.count() == 13
    # without the bail, the same call converges (diameter < max_iter)
    ok = connected_components_pairs(chain, max_iter=20, mode="minlabel")
    assert ok.count() == 13


def test_auto_mode_quotient_composition(spark):
    """r8: auto's fallback contracts the pair graph by the bailed
    min-label attempt's partial labels and composes keepers through the
    quotient. Mixed graph — a dense star (merges fully inside the
    budget), a chain longer than the budget, and a self-loop-only node
    — must come out identical to plain min-label with a big budget."""
    from opencv_table_extraction_spark.operators.dedup import (
        connected_components_pairs,
    )

    edges = (
        [(100, 100 + i) for i in range(1, 6)]        # star, keeper 100
        + [(i, i + 1) for i in range(12)]            # chain 0..12
        + [(500, 500)]                               # self-loop singleton
    )
    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    want = {
        (r["doc_id"], r["keeper_id"], r["cluster_size"])
        for r in connected_components_pairs(df, max_iter=30,
                                            mode="minlabel").collect()
    }
    got = {
        (r["doc_id"], r["keeper_id"], r["cluster_size"])
        for r in connected_components_pairs(df, max_iter=30,
                                            mode="auto").collect()
    }
    assert got == want
    assert (500, 500, 1) in got


def test_sample_by_quality_strata_and_rates(spark, tmp_path):
    """Constructed docs across all three strata (the parquet corpus is
    ~all 'high', so the mid/low rate paths need planting): the kept set
    must equal an INDEPENDENT hashlib-md5 truth of bucket < rate —
    pinning the Spark md5/conv arithmetic, the stratum assignment
    boundaries, and determinism in one shot."""
    import hashlib

    from opencv_table_extraction_spark.operators.textstats import (
        _q_sample_by_quality,
    )

    high = " ".join(f"tok{i}" for i in range(14)) + " the"  # sr 1/15
    mid = "the a of and to x1 x2 x3 x4 x5 x6 x7"  # sr 5/12 ~ 0.4167
    low = "tiny doc"  # 2 tokens < 10
    rows = [(i, {0: high, 1: mid, 2: low}[i % 3], "s") for i in range(300)]
    spark.createDataFrame(rows, ["doc_id", "text", "source"]).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["stratum"], r["sample_bucket"])
        for r in _q_sample_by_quality(spark, str(tmp_path)).collect()
    }

    def bucket(i):
        return int(
            hashlib.md5(f"sample:{i}".encode()).hexdigest()[:8], 16
        ) % 100

    strat = {0: ("high", 100), 1: ("mid", 50), 2: ("low", 10)}
    expect = {
        i: (strat[i % 3][0], bucket(i))
        for i in range(300)
        if bucket(i) < strat[i % 3][1]
    }
    assert got == expect
    # all three rate paths actually exercised
    kept = [s for s, _ in got.values()]
    assert kept.count("high") == 100
    assert 0 < kept.count("mid") < 100
    assert 0 < kept.count("low") < 50


def test_scrub_pii_redacts_all_occurrences(spark):
    """Hand-written PII text: every occurrence of every pattern type is
    redacted (Spark regexp_replace is global; the DuckDB oracle needs
    the explicit 'g' flag — this pins the Spark half of that contract),
    clean text passes untouched, and counts equal redactions: each
    pattern counts on the progressively-scrubbed text (r6 advice), so a
    substring matching two patterns is counted only by the pattern that
    redacted it — pinned by doc 3, where the phone-shaped email local
    part must NOT inflate n_phones."""
    from opencv_table_extraction_spark.operators.textstats import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+x@e.org, host 10.0.0.1 "
                "tel 123-456-7890 or 12-345-678"),
            (2, "no pii here at all"),
            (3, "forwarded by 12-345-6789@relay.example.org yesterday"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    r1 = got[1]
    assert (r1["n_emails"], r1["n_ips"], r1["n_phones"]) == (2, 1, 2)
    assert r1["scrubbed"] == (
        "mail <EMAIL> and <EMAIL>, host <IP> tel <PHONE> or <PHONE>"
    )
    r2 = got[2]
    assert (r2["n_emails"], r2["n_ips"], r2["n_phones"]) == (0, 0, 0)
    assert r2["scrubbed"] == "no pii here at all"
    r3 = got[3]
    assert (r3["n_emails"], r3["n_ips"], r3["n_phones"]) == (1, 0, 0)
    assert r3["scrubbed"] == "forwarded by <EMAIL> yesterday"
    # invariant the progressive counts buy: sum of counts == redactions
    for r in got.values():
        assert (
            r["n_emails"] + r["n_ips"] + r["n_phones"]
            == r["scrubbed"].count("<EMAIL>")
            + r["scrubbed"].count("<IP>")
            + r["scrubbed"].count("<PHONE>")
        )


def test_repetition_stats_kernel():
    """Hand-computed expectations for the Gopher-style repetition
    metrics, covering the shapes the parquet corpus lacks (it has no
    newlines): multi-line docs with duplicate lines, whitespace-only
    lines, boilerplate bigram repetition, empty text. Pure kernel test —
    the end-to-end oracle parity runs in tools/check_queries.py."""
    from opencv_table_extraction_spark.operators.textstats import (
        repetition_stats_batch,
    )

    texts = [
        # 4 non-empty lines ("x" twice + "  " whitespace-only line is
        # dropped); dup occurrences = 2 of 4
        "x\na b\n  \nx\nc d",
        # boilerplate: "spam ham" bigram dominates; tokens =
        # [spam, ham, spam, ham, spam] -> bigrams: (spam,ham) x2,
        # (ham,spam) x2 -> top 2/4; trigrams: (s,h,s), (h,s,h),
        # (s,h,s) -> distinct 2 of 3
        "Spam ham SPAM ham spam",
        # all-distinct control
        "a b c d e",
        "",
    ]
    got = repetition_stats_batch(texts)
    assert got[0][0] == 4.0 and got[0][1] == 2 / 4
    assert got[1] == [1.0, 0.0, 2 / 4, 1 - 2 / 3]
    assert got[2] == [1.0, 0.0, 1 / 4, 0.0]
    assert got[3] == [0.0, 0.0, 0.0, 0.0]


def test_winnow_oracle_matches_on_edge_whitespace(spark, tmp_path):
    """The winnow DuckDB oracle must agree with the Spark query even for
    texts edged with tabs/newlines (the r2 ADVICE divergence: DuckDB's
    bare trim strips spaces only; the oracle now trims an explicit
    ASCII-whitespace charset to match Python's .split() normalizer)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencv_table_extraction_spark.operators.textstats import (
        _SQL_WINNOW,
        _q_winnow,
    )

    texts = [
        "\tthe quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog\n",
        " mixed \t interior\nwhitespace  and  edges \t",
        "plain space edged text for control ",
        "short",
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(tmp_path / "documents.parquet"),
    )
    got = {r["doc_id"]: (r["n_fingerprints"], r["fingerprints_csv"])
           for r in _q_winnow(spark, str(tmp_path)).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {int(r[0]): (int(r[1]), r[2])
            for r in con.execute(_SQL_WINNOW).fetchall()}
    assert got == want


def test_shingles_expression(spark):
    from opencv_table_extraction_spark.operators.dedup import shingles

    df = spark.createDataFrame([("a b c d",), ("x y",)], ["text"])
    got = [r["sh"] for r in df.select(shingles(F.col("text")).alias("sh")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["x y"]


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir engages the reliable checkpoint() path (periodic
    label truncation + checkpointed result): a long chain whose
    propagation needs more rounds than the truncation interval must
    converge to the same keepers as the localCheckpoint path, and the
    checkpoint dir must actually receive data."""
    import os

    from opencv_table_extraction_spark.operators.dedup import (
        connected_components_pairs,
    )

    # chain 10-...-22: diameter 12, so the per-round reliable
    # truncation fires many times mid-loop
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 22)], ["a_id", "b_id"]
    )
    ckpt = str(tmp_path / "ckpt")
    got = {r["doc_id"]: (r["keeper_id"], r["cluster_size"])
           for r in connected_components_pairs(
               chain, max_iter=20, checkpoint_dir=ckpt).collect()}
    assert got == {d: (10, 13) for d in range(10, 23)}
    wrote = any(files for _, _, files in os.walk(ckpt))
    assert wrote, "reliable checkpoint dir received no data"

    # same contract for the twostar mode's per-round reliable truncation
    ckpt2 = str(tmp_path / "ckpt2")
    got2 = {r["doc_id"]: (r["keeper_id"], r["cluster_size"])
            for r in connected_components_pairs(
                chain, max_iter=20, checkpoint_dir=ckpt2,
                mode="twostar").collect()}
    assert got2 == got
    assert any(files for _, _, files in os.walk(ckpt2))


def test_winnow_batch_equals_per_doc():
    """The cross-doc vectorized winnow kernel (one global Horner pass +
    one global window pass) must be EXACTLY the per-document reference
    on real docs, boundary-length strings, unicode, and whitespace
    edges — document boundaries must never leak into hashes or window
    selection."""
    import random
    import string

    import pyarrow.parquet as pq

    from opencv_table_extraction_spark.operators.textstats import (
        winnow_fingerprint,
        winnow_fingerprint_batch,
    )

    texts = (
        pq.read_table("/root/testdata/sf0.001/documents.parquet")
        .column("text")
        .to_pylist()
    )
    edges = ["", None, "ab", "abcdefg", "abcdefgh", "  x\t\ny  ",
             "a" * 7, "a" * 8, "a" * 9, "a" * 13, "a" * 14, "a" * 15,
             "é" * 20, "\U0001f600" * 12]
    rng = random.Random(7)
    fuzz = ["".join(rng.choice(string.ascii_lowercase + "  \t\n")
                    for _ in range(rng.randrange(0, 60))) for _ in range(300)]
    for batch in (texts, edges, fuzz, []):
        assert winnow_fingerprint_batch(batch) == [
            winnow_fingerprint(t or "") for t in batch
        ]


def test_connected_components_restores_prior_checkpoint_dir(spark, tmp_path):
    """connected_components_pairs(checkpoint_dir=...) must not leak its
    dir into the session: a prior checkpoint dir is restored on exit, so
    later unrelated checkpoint() calls don't land in a directory the
    caller may delete."""
    from opencv_table_extraction_spark.operators.dedup import (
        connected_components_pairs,
    )

    sc = spark.sparkContext
    prior = str(tmp_path / "prior_ckpt")
    ours = str(tmp_path / "cc_ckpt")
    sc.setCheckpointDir(prior)
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["a_id", "b_id"])
    connected_components_pairs(pairs, checkpoint_dir=ours).collect()
    got = sc.getCheckpointDir()
    # getCheckpointDir returns the RESOLVED dir (Spark appends a UUID
    # subdir per set); what matters is that future checkpoints land
    # back under the caller's original tree, not under ours
    assert got and "prior_ckpt" in got and "cc_ckpt" not in got, got


def test_connected_components_random_graphs(spark):
    """Property test: on seeded random pair graphs (self-contained
    clusters, chains, isolated pairs, dense blobs) the distributed
    min-label propagation must equal a Python union-find — keepers AND
    cluster sizes."""
    import random

    from opencv_table_extraction_spark.operators.dedup import (
        connected_components_pairs,
    )

    def union_find(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        groups = {}
        for n in list(parent):
            groups.setdefault(find(n), []).append(n)
        out = {}
        for root, members in groups.items():
            keeper = min(members)
            for m in members:
                out[m] = (keeper, len(members))
        return out

    for seed in range(4):
        rng = random.Random(seed)
        n_nodes = rng.randrange(4, 40)
        edges = set()
        for _ in range(rng.randrange(2, 60)):
            a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        if not edges:
            edges = {(0, 1)}
        # self-loops, including on ids ABOVE the edge range so some are
        # self-loop-only: both modes must emit (d, d, 1) for those
        loops = {(i, i) for i in rng.sample(range(n_nodes + 5), 3)}
        pairs = spark.createDataFrame(
            sorted(edges | loops), ["a_id", "b_id"]
        )
        want = union_find(edges)
        for i, _ in loops:
            want.setdefault(i, (i, 1))
        for mode in ("minlabel", "twostar"):
            got = {r["doc_id"]: (r["keeper_id"], r["cluster_size"])
                   for r in connected_components_pairs(
                       pairs, max_iter=40, mode=mode).collect()}
            assert got == want, (seed, mode)


def test_pairs_crosscheck_agrees_and_reports_drops(spark):
    """The certified recall cross-check: on a corpus with planted
    near-dups, the probabilistic LSH and the exact prefix join must
    produce identical pair sets with zero drops — and the returned
    one-row frame must say exactly that (the invariant the sf0.1 sweep
    certifies via check_queries --invariant)."""
    from opencv_table_extraction_spark.operators.dedup import pairs_crosscheck

    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
    )
    toks = F.split(F.trim("text"), r"\s+")
    trunc = F.array_join(
        F.slice(toks, 1, F.floor(F.size(toks) * 0.9).cast("int")), " "
    )
    near = d.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                    trunc.alias("text"))
    r = pairs_crosscheck(d.unionByName(near)).collect()[0]
    assert r["n_symmetric_diff"] == 0
    assert r["n_dropped_lsh"] == 0 and r["n_dropped_prefix"] == 0
    assert r["n_pairs_lsh"] == r["n_pairs_prefix"] >= 80  # planted dups found


def test_components_tolerate_messy_pair_input(spark):
    """Real pair generators are deduped and canonical, but the operator
    must not depend on it: self-loops, duplicate pairs, and both
    orientations of the same edge must not change the clustering in
    either mode."""
    from opencv_table_extraction_spark.operators.dedup import (
        connected_components_pairs,
    )

    messy = spark.createDataFrame(
        # (3, 3): self-loop on a clustered node; (9, 9): a self-loop-ONLY
        # node — must come out as a (9, 9, 1) singleton in BOTH modes
        # (r5 ADVICE: twostar used to drop it silently)
        [(1, 2), (2, 1), (1, 2), (2, 3), (3, 3), (5, 6), (9, 9)],
        ["a_id", "b_id"],
    )
    want = {1: (1, 3), 2: (1, 3), 3: (1, 3), 5: (5, 2), 6: (5, 2), 9: (9, 1)}
    for mode in ("minlabel", "twostar"):
        got = {r["doc_id"]: (r["keeper_id"], r["cluster_size"])
               for r in connected_components_pairs(
                   messy, max_iter=20, mode=mode).collect()}
        assert got == want, (mode, got)


def test_two_star_components_logarithmic_on_long_chain(spark):
    """The twostar mode is THE long-chain scale path: a 1,024-node path
    graph (diameter 1,023 — min-label propagation would need ~1,023
    rounds) must converge in O(log diameter) rounds with the correct
    single cluster. Measured 11 rounds (~log2(1024)); assert <= 14 so
    the bound fails loudly if the alternation ever degrades toward
    linear."""
    from opencv_table_extraction_spark.operators.dedup import (
        connected_components_pairs,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1023)], ["a_id", "b_id"]
    )
    rounds: list[int] = []
    got = {r["doc_id"]: (r["keeper_id"], r["cluster_size"])
           for r in connected_components_pairs(
               chain, max_iter=25, mode="twostar", round_counter=rounds
           ).collect()}
    assert len(got) == 1024
    assert all(v == (0, 1024) for v in got.values())
    assert rounds and rounds[0] <= 14, rounds


@pytest.fixture
def session_scoped_ckpt_after(spark, tmp_path_factory):
    """This test intentionally leaves the shared session WITH a
    checkpoint dir (Spark cannot unset one); without cleanup that dir
    would be this test's function-scoped tmp_path — pruned while the
    session lives. Re-point it at a session-scoped tmp dir afterwards so
    later tests never inherit a doomed directory (r5 ADVICE)."""
    yield
    spark.sparkContext.setCheckpointDir(
        str(tmp_path_factory.mktemp("session_ckpt"))
    )


def test_components_checkpoint_dir_warns_without_prior(
    spark, tmp_path, session_scoped_ckpt_after
):
    """When the session has NO prior checkpoint dir, passing
    checkpoint_dir= must warn that ours remains session-global after
    the call (Spark cannot unset it) — callers on shared sessions need
    to know later reliable checkpoints land in the dir they own. With a
    prior dir set, no warning (it is restored instead)."""
    import warnings

    from opencv_table_extraction_spark.operators.dedup import (
        connected_components_pairs,
    )

    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["a_id", "b_id"])
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        with pytest.warns(UserWarning, match="checkpoint dir"):
            connected_components_pairs(
                pairs, checkpoint_dir=str(tmp_path / "ck1")
            ).collect()
    # now a dir IS set (either pre-existing or left by the call above):
    # the restore path must stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        connected_components_pairs(
            pairs, checkpoint_dir=str(tmp_path / "ck2")
        ).collect()
