"""Unit gates for the curation operators: split disjointness/stability,
PII redaction on planted fixtures, repetition flagging, contamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_360_etl_pipeline_on_azure_cloud_spark.operators.sampling import (
    deterministic_sample,
    split_assign,
)
from customer_360_etl_pipeline_on_azure_cloud_spark.operators.text import (
    pii_counts,
    redact_pii,
)


def test_split_assign_disjoint_exhaustive_stable(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_assign(df, "k", fr)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    # exhaustive: every row got exactly one label
    assert sum(counts.values()) == 5000
    # roughly proportional (md5 is uniform; 5000 keys, generous bounds)
    assert 3700 <= counts["train"] <= 4300
    assert 300 <= counts["val"] <= 700
    assert 300 <= counts["test"] <= 700
    # stable across partitionings
    a = {r["k"]: r["split"] for r in out.collect()}
    b = {r["k"]: r["split"]
         for r in split_assign(df.repartition(13), "k", fr).collect()}
    assert a == b


def test_split_train_band_is_superset_of_sample(spark):
    # the train band [0, 0.8) equals the deterministic_sample(rate=0.8) set
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    train = {
        r["k"]
        for r in split_assign(df, "k", {"train": 0.8, "rest": 0.2})
        .filter(F.col("split") == "train")
        .collect()
    }
    sampled = {r["k"] for r in deterministic_sample(df, "k", 0.8).collect()}
    assert train == sampled


def test_redact_pii_planted(spark):
    rows = [
        (1, "mail me at alice.smith+x@corp.example.org please"),
        (2, "server 192.168.100.7 rebooted, backup 10.0.0.254 ok"),
        (3, "call +1-555-0199 or +44-202-7946000"),
        (4, "clean text with no personal data at all"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {
        r["id"]: (r["red"], r["n_email"], r["n_ip"], r["n_phone"])
        for r in df.select(
            "id", redact_pii("t").alias("red"), *pii_counts("t")
        ).collect()
    }
    assert got[1] == ("mail me at <EMAIL> please", 1, 0, 0)
    assert got[2] == ("server <IP> rebooted, backup <IP> ok", 0, 2, 0)
    assert got[3] == ("call <PHONE> or <PHONE>", 0, 0, 2)
    assert got[4] == ("clean text with no personal data at all", 0, 0, 0)


def test_doc_repetition_flags_planted_doc(spark):
    from customer_360_etl_pipeline_on_azure_cloud_spark.curation_queries import (
        q_doc_repetition,
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs = spark.createDataFrame(
            [
                (1, "spam spam spam spam spam spam", "en", "s", 30),
                (2, "one two three four five six seven", "en", "s", 33),
                (3, "solo", "en", "s", 4),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {r["doc_id"]: r.asDict() for r in q_doc_repetition(spark, td).collect()}
    # doc 1: 5 bigrams, 1 distinct -> 80% duplicates -> flagged
    assert out[1]["n_bigrams"] == 5 and out[1]["n_distinct"] == 1
    assert out[1]["is_repetitive"] is True
    # doc 2: all bigrams unique -> clean
    assert out[2]["is_repetitive"] is False
    # doc 3: single token -> zero bigrams, never flagged
    assert out[3]["n_bigrams"] == 0 and out[3]["is_repetitive"] is False


def test_rare_token_stats_boundary_and_invariants(spark):
    """Vocab cutoff determinism + integer invariants: with a tiny corpus
    whose frequencies force count ties at the top-K boundary, the kept
    vocabulary must break ties token-ascending, and per-doc counts obey
    0 <= n_distinct_rare <= n_rare <= n_tokens."""
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.text import (
        rare_token_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "aa aa bb bb cc dd"),   # aa,bb freq 2; cc,dd freq 1 (tie)
            (2, "aa bb cc cc zz zz zz"),
        ],
        ["doc_id", "text"],
    )
    # top-3 vocab by (count desc, token asc): zz(3), aa(3)... recount:
    # aa: 3, bb: 3, cc: 3, dd: 1, zz: 3 -> top3 = aa, bb, cc (tie on 3,
    # token-ascending beats zz). dd and zz are rare.
    out = {r["doc_id"]: r for r in rare_token_stats(docs, top_k_vocab=3).collect()}
    assert out[1]["n_tokens"] == 6 and out[1]["n_rare"] == 1  # dd
    assert out[1]["n_distinct_rare"] == 1
    assert out[2]["n_tokens"] == 7 and out[2]["n_rare"] == 3  # zz x3
    assert out[2]["n_distinct_rare"] == 1
    for r in out.values():
        assert 0 <= r["n_distinct_rare"] <= r["n_rare"] <= r["n_tokens"]


# --- classifier training (round 6) ------------------------------------------


def test_nb_train_weights_matches_pure_python_and_learns(spark):
    """Third implementation: pure-Python count-based training on a
    LEARNABLE synthetic corpus (token distributions differ by class),
    compared weight-for-weight; then the trained classifier must
    actually separate held-out documents of the two classes."""
    import hashlib
    import random

    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.text import (
        hashed_linear_score_trained,
        nb_train_weights,
    )

    rng = random.Random(7)
    good_vocab = [f"g{i}" for i in range(20)]
    bad_vocab = [f"b{i}" for i in range(20)]
    common = [f"c{i}" for i in range(10)]
    rows = []
    for i in range(200):
        pos = i % 2 == 0
        vocab = (good_vocab if pos else bad_vocab) + common
        toks = [rng.choice(vocab) for _ in range(30)]
        rows.append((i, " ".join(toks), pos))
    df = spark.createDataFrame(rows, "doc_id long, text string, pos boolean")
    train = df.filter(F.col("doc_id") < 150)
    held = df.filter(F.col("doc_id") >= 150)

    MOD, SCALE = 2001, 1_000_000

    def feat(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % MOD

    counts = {}
    for doc_id, text, pos in rows:
        if doc_id >= 150:
            continue
        for t in text.strip().split(" "):
            f = feat(t)
            p, n = counts.get(f, (0, 0))
            counts[f] = (p + 1, n) if pos else (p, n + 1)
    expected = {
        f: (p, n, ((p + 1) * SCALE) // (p + n + 2) - SCALE // 2)
        for f, (p, n) in counts.items()
    }

    weights = nb_train_weights(train, "pos", text_col="text")
    got = {
        r.feature: (r.n_pos, r.n_neg, r.weight) for r in weights.collect()
    }
    assert got == expected

    scored = hashed_linear_score_trained(held, weights).select(
        "doc_id", "pos", "label"
    )
    wrong = scored.filter(
        (F.col("pos") & (F.col("label") == "drop"))
        | (~F.col("pos") & (F.col("label") == "keep"))
    ).count()
    total = scored.count()
    assert total == 50
    assert wrong == 0, f"separable corpus must classify cleanly ({wrong}/{total} wrong)"


def test_bigram_nll_detects_shuffled_text(spark):
    """The property unigram perplexity cannot have: permuting a
    document's tokens leaves its unigram nll unchanged but must RAISE
    its bigram nll (transitions break).  Built on a corpus of repeated
    natural word order plus one shuffled copy."""
    import random

    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.text import (
        bigram_nll,
        unigram_nll,
    )

    base = "the quick brown fox jumps over the lazy dog".split()
    rng = random.Random(3)
    rows = []
    for i in range(30):  # fluent docs: same transitions everywhere
        rows.append((i, " ".join(base * 3)))
    shuffled = base * 3
    rng.shuffle(shuffled)
    rows.append((99, " ".join(shuffled)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uni = {r.doc_id: r.avg_nll for r in unigram_nll(df).collect()}
    big = {r.doc_id: r.avg_nll for r in bigram_nll(df).collect()}
    # unigram: shuffled doc has the SAME bag of words as doc 0
    assert abs(uni[99] - uni[0]) < 1e-12
    # bigram: broken transitions must score strictly worse
    assert big[99] > big[0] + 0.5


def test_bigram_nll_hand_computed(spark):
    """Tiny corpus, hand-replayed interpolated bigram model."""
    import math

    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.text import (
        bigram_nll,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    # counts: unigrams a:3 b:3 N=6; bigrams: (a,b):3, (b,a):1
    def lp(cb, cl, cr):
        return math.log(0.5 * (cb / cl) + 0.5 * (cr / 6))

    d1 = -(lp(3, 3, 3) + lp(1, 3, 3) + lp(3, 3, 3)) / 3
    d2 = -lp(3, 3, 3) / 1
    got = {r.doc_id: (r.n_bigrams, r.avg_nll) for r in bigram_nll(df).collect()}
    assert got[1][0] == 3 and got[2][0] == 1
    assert abs(got[1][1] - d1) < 1e-12
    assert abs(got[2][1] - d2) < 1e-12


def test_decontamination_spans_match_pure_python(spark):
    """Third implementation: pure-Python benchmark n-gram lookup +
    interval merge over a random corpus with planted benchmark
    overlaps, compared row-for-row with the Spark operator."""
    import random

    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.dedup import (
        contaminated_token_spans,
    )

    rng = random.Random(7)
    N = 3
    eval_q = [f"q{i}" for i in range(7)]   # a 7-token benchmark question
    eval_r = [f"r{i}" for i in range(4)]   # a 4-token benchmark answer
    bench_docs = [(100, " ".join(eval_q)), (101, " ".join(eval_r + ["pad"]))]
    corpus_docs = []
    for d in range(10):
        toks = [f"c{d}_{i}" for i in range(rng.randint(2, 25))]
        if d % 2 == 0:  # plant the question
            at = rng.randint(0, len(toks))
            toks = toks[:at] + eval_q + toks[at:]
        if d % 5 == 0:  # plant the answer too (overlapping merges)
            at = rng.randint(0, len(toks))
            toks = toks[:at] + eval_r + toks[at:]
        corpus_docs.append((d, " ".join(toks)))

    vocab = set()
    for _, text in bench_docs:
        t = text.split()
        for i in range(len(t) - N + 1):
            vocab.add(" ".join(t[i : i + N]))
    expected = set()
    for d, text in corpus_docs:
        t = text.split()
        ps = [
            i + 1
            for i in range(len(t) - N + 1)
            if " ".join(t[i : i + N]) in vocab
        ]
        spans = []
        for p in ps:
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], p + N - 1)
            else:
                spans.append((p, p + N - 1))
        for s, e in spans:
            expected.add((d, s, e, e - s + 1))
    assert expected, "planted overlaps must produce spans"

    corpus = spark.createDataFrame(corpus_docs, "doc_id long, text string")
    bench = spark.createDataFrame(bench_docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.cut_tokens)
        for r in contaminated_token_spans(corpus, bench, n=N).collect()
    }
    assert got == expected


def test_remove_contaminated_spans_cuts_exactly(spark):
    """Applying the decontamination cut removes exactly the spans'
    tokens; clean docs pass through whitespace-normalized-identical;
    and the cleaned corpus re-scans to ZERO contaminated positions
    (termination: cutting cannot create a benchmark 3-gram here
    because surviving tokens are corpus-unique words)."""
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.dedup import (
        contaminated_token_spans,
        remove_contaminated_spans,
    )

    bench = spark.createDataFrame(
        [(100, "x0 x1 x2 x3 x4")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (0, "a0 a1 x0 x1 x2 x3 x4 a2 a3"),  # planted benchmark run
            (1, "b0 b1 b2 b3"),                  # clean
            (2, "x0 x1 x2 c0 x2 x3 x4"),         # two disjoint partial hits
        ],
        "doc_id long, text string",
    )
    spans = contaminated_token_spans(corpus, bench, n=3)
    cut = {
        r.doc_id: r.total
        for r in spans.groupBy("doc_id")
        .agg(F.sum("cut_tokens").alias("total"))
        .collect()
    }
    cleaned = remove_contaminated_spans(corpus, bench, n=3)
    rows = {r.doc_id: r for r in cleaned.collect()}
    assert len(rows) == 3
    for d in rows:
        r = rows[d]
        assert r.n_tokens_before - r.n_tokens_after == cut.get(d, 0)
    assert rows[1].clean_text == "b0 b1 b2 b3"
    assert "x0 x1 x2" not in " " + rows[0].clean_text + " "
    again = contaminated_token_spans(
        cleaned.select("doc_id", F.col("clean_text").alias("text")),
        bench,
        n=3,
    ).count()
    assert again == 0


def test_shard_manifest_properties(spark):
    """Epoch-shuffle manifest: every key appears exactly once, shard is
    the key-hash residue, positions are contiguous 1..n per shard, the
    result is partitioning-independent, and two epochs produce
    genuinely different permutations (different shard assignment for
    at least one doc on a 64-doc corpus: P[identical] ~ 8^-64)."""
    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.sampling import (
        shard_manifest,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(64)], "doc_id long, text string"
    )
    m1 = shard_manifest(docs, "doc_id", epoch=1, n_shards=8)
    rows = m1.collect()
    assert sorted(r.doc_id for r in rows) == list(range(64))
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # partitioning-independence
    m1b = shard_manifest(docs.repartition(13), "doc_id", epoch=1, n_shards=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, m1b.collect()))
    # epochs permute
    m2 = {r.doc_id: (r.shard, r.pos_in_shard) for r in
          shard_manifest(docs, "doc_id", epoch=2, n_shards=8).collect()}
    assert any(m2[r.doc_id] != (r.shard, r.pos_in_shard) for r in rows)


def test_source_kl_rank_matches_python(spark):
    """Pure-Python third implementation of the per-group KL rank on a
    corpus with three groups at clearly different distances from the
    blend — the skewed group must rank first, the near-corpus group
    last, and counts must be exact."""
    import math
    from collections import Counter

    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.text import (
        source_kl_rank,
    )

    corpus = {
        "balanced": "a b c d " * 6,            # near the blend
        "skewed": "a a a a a a a a a a a a z", # far from it
        "mid": "a b a b c c d a " * 3,
    }
    docs = spark.createDataFrame(
        [(i, s, t.strip()) for i, (s, t) in enumerate(corpus.items())],
        "doc_id long, source string, text string",
    )
    got = {
        r.source: (r.n_tokens, r.vocab_terms, r.drift_rank)
        for r in source_kl_rank(docs).collect()
    }

    per = {s: Counter(t.split()) for s, t in corpus.items()}
    corp: Counter = Counter()
    for c in per.values():
        corp.update(c)
    n_total = sum(corp.values())
    kl = {}
    for s, c in per.items():
        n_s = sum(c.values())
        kl[s] = sum(
            (cw / n_s) * math.log((cw * n_total) / (corp[w] * n_s))
            for w, cw in c.items()
        )
        assert got[s][0] == n_s
        assert got[s][1] == len(c)
    order = sorted(kl, key=lambda s: (-kl[s], s))
    for rank, s in enumerate(order, 1):
        assert got[s][2] == rank, (s, kl)
    assert order[0] == "skewed"


def test_dsir_topk_matches_python(spark):
    """Pure-Python third implementation of the DSIR top-k selection on
    a corpus where one raw doc is written in target-domain tokens and
    another in raw-only tokens — the target-like doc must outrank it,
    and the full rank order must match the reference exactly."""
    import hashlib
    import math
    from collections import Counter

    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.text import (
        dsir_topk,
    )
    from pyspark.sql import functions as F

    B = 64
    rows = [
        (0, "t", "alpha beta gamma alpha beta"),
        (1, "t", "alpha gamma gamma beta"),
        (2, "r", "alpha beta alpha gamma"),      # target-like
        (3, "r", "zeta eta theta zeta eta"),     # raw-only tokens
        (4, "r", "alpha zeta beta eta"),         # mixed
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.doc_id: (r.n_tokens, r.sel_rank)
        for r in dsir_topk(
            docs, target=F.col("lang") == "t", feature_mod=B, k=10
        ).collect()
    }

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % B

    ct: Counter = Counter()
    cr: Counter = Counter()
    for _, lang, text in rows:
        for w in text.split():
            (ct if lang == "t" else cr)[bucket(w)] += 1
    nt, nr = sum(ct.values()), sum(cr.values())
    lw = {}
    ntok = {}
    for did, lang, text in rows:
        if lang == "t":
            continue
        ws = text.split()
        ntok[did] = len(ws)
        lw[did] = sum(
            (math.log(ct[bucket(w)] + 1.0) - math.log(cr[bucket(w)] + 1.0))
            + (math.log(nr + float(B)) - math.log(nt + float(B)))
            for w in ws
        )
    order = sorted(lw, key=lambda d: (-lw[d], d))
    assert set(got) == set(lw)
    for rank, did in enumerate(order, 1):
        assert got[did] == (ntok[did], rank), (did, lw)
    assert order[0] == 2 and order[-1] == 3


def test_pca_power_project_matches_numpy_direction(spark):
    """On a corpus with a dominant principal direction, the integer
    power-iteration projection must align with numpy's top eigenvector
    projection (|cosine| > 0.99 between the two projection vectors),
    and the output must be partitioning-independent."""
    import numpy as np

    from customer_360_etl_pipeline_on_azure_cloud_spark.operators.similarity import (
        pca_power_project,
    )

    rng = np.random.RandomState(7)
    d, n = 16, 300
    w = rng.randn(d)
    w /= np.linalg.norm(w)
    X = np.outer(rng.randn(n) * 3.0, w) + 0.05 * rng.randn(n, d)
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {r.vec_id: r.pc1_fp for r in pca_power_project(df).collect()}
    got2 = {
        r.vec_id: r.pc1_fp
        for r in pca_power_project(df.repartition(11)).collect()
    }
    assert got == got2

    # numpy reference projection (float path, on the SAME quantized X
    # the operator consumes)
    Q = np.round(np.array([np.float64(np.float32(x)) for x in X.ravel()])
                 .reshape(n, d) * 10**6)
    G = Q.T @ Q
    evals, evecs = np.linalg.eigh(G)
    top = evecs[:, -1]
    ref = Q @ top
    out = np.array([got[i] for i in range(n)], dtype=np.float64)
    cos = abs(np.dot(ref, out) / (np.linalg.norm(ref) * np.linalg.norm(out)))
    assert cos > 0.99, cos
