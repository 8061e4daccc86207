"""LLM-pipeline extension ops: text stats vs a pure-Python reference,
dedup invariants, SimHash cross-check, ANN recall vs brute force."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from big_data_project_datapipeline_spark.functions import dedup as D
from big_data_project_datapipeline_spark.functions import similarity as SIM
from big_data_project_datapipeline_spark.functions import text as TX

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (3, "el gato y el perro en la casa"),
    (4, "completely different words entirely unrelated tokens"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_text_stats_against_python(docs):
    rows = {r["doc_id"]: r for r in TX.add_text_stats(docs).collect()}
    for doc_id, text in DOCS:
        toks = [t for t in text.lower().split() if t]
        r = rows[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["n_chars_measured"] == len(text)
        if toks:
            assert abs(r["avg_token_len"] - sum(map(len, toks)) / len(toks)) < 1e-9
        sw = sum(1 for t in toks if t in TX.STOPWORDS["en"])
        if toks:
            assert abs(r["stopword_ratio_en"] - sw / len(toks)) < 1e-9


def test_lang_id(docs):
    rows = {r["doc_id"]: r["predicted_lang"] for r in TX.add_text_stats(docs).collect()}
    assert rows[0] == "en"
    assert rows[3] == "es"
    assert rows[4] == "unknown"  # no stopwords at all
    assert rows[5] == "unknown"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO  WORLD.")],
        "doc_id long, text string",
    )
    fps = [r["fp"] for r in df.select(TX.normalized_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_exact_dedup_groups(docs):
    out = D.exact_dedup(docs).collect()
    groups = {r["keep_id"]: r["n_copies"] for r in out}
    assert groups[0] == 2  # docs 0 and 2 identical, keeper = min id
    assert 2 not in groups


def test_minhash_decision_flags_near_dups(docs):
    out = {
        r["doc_id"]: r
        for r in D.minhash_dedup_decision(
            # band_size=2 → 8 bands: catch probability 1-(1-s²)^8 ≈ 0.999
            # at s≈0.78 (r=4 would deterministically miss this md5 draw)
            docs.filter("text <> ''"), num_hashes=16, band_size=2, threshold=0.5
        ).collect()
    }
    assert out[0]["is_kept"] == 1                        # cluster root
    assert out[2]["is_kept"] == 0 and out[2]["dup_of"] == 0   # exact dup
    assert out[4]["is_kept"] == 1                        # unrelated doc kept
    # doc 1 is a 0.8-jaccard near-dup of doc 0 — banding at r=4 catches it
    assert out[1]["dup_of"] == 0 and out[1]["is_kept"] == 0


def test_simhash_against_python(docs):
    got = {r["doc_id"]: r["simhash"] for r in D.simhash(docs.filter("text <> ''"), bits=32).collect()}

    def py_simhash(text: str, bits: int = 32) -> int:
        toks = sorted({t for t in text.lower().split() if t})
        votes = [0] * bits
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for j in range(bits):
                votes[j] += 1 if (h >> j) & 1 else -1
        return sum(1 << j for j in range(bits) if votes[j] > 0)

    for doc_id, text in DOCS:
        if text:
            assert got[doc_id] == py_simhash(text), doc_id


def test_hamming_distance(spark):
    df = spark.createDataFrame([(0b1010, 0b0110)], "a long, b long")
    assert df.select(D.hamming_distance(F.col("a"), F.col("b")).alias("d")).first()["d"] == 2


def test_cosine_topk_against_python(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.1]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = SIM.cosine_topk(df, df.filter("vec_id = 0"), k=2).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    got1 = [r for r in out if r["neighbor_id"] == 1][0]["cosine_sim"]
    assert abs(got1 - cos(vecs[0][1], vecs[1][1])) < 1e-6


def test_ivf_recall_scales_with_probes(spark):
    """IVF: recall must grow with n_probe (the recall/cost dial)."""
    from big_data_project_datapipeline_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 5")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.cosine_topk(emb, queries, k=5).collect()
    }

    def recall(n_probe):
        a = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.ivf_topk(
                emb, queries, k=5, n_lists=16, n_probe=n_probe
            ).collect()
        }
        return len(exact & a) / len(exact)

    r4, r8 = recall(4), recall(8)
    assert r8 >= r4 >= 0.3, (r4, r8)


def test_ann_recall_vs_brute_force(spark):
    """SRP-LSH must recover a decent fraction of true top-5 neighbours on
    the driver embeddings table (structured vectors, 10 labelled clusters)."""
    from big_data_project_datapipeline_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 5")
    exact = SIM.cosine_topk(emb, queries, k=5).collect()
    approx = SIM.ann_topk_lsh(emb, queries, k=5, num_bits=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"ANN recall too low: {recall}"


def test_ann_lsh_guards_large_query_broadcast(spark, monkeypatch):
    """The query side is broadcast — a corpus-sized 'query batch' must be
    rejected, not silently shipped to every executor."""
    import pytest

    from big_data_project_datapipeline_spark.functions import similarity

    monkeypatch.setattr(similarity, "_LSH_BROADCAST_MAX_QUERIES", 8)
    from big_data_project_datapipeline_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="broadcasts the query side"):
        similarity.ann_topk_lsh(emb, emb.limit(100), k=5, num_bits=4)


def test_solve_banding_tracks_threshold():
    """The solver's chosen (b, r) must put the S-curve's steepest point
    near the requested threshold, and higher thresholds must yield
    longer bands (more rows per band = stricter buckets)."""
    picks = {}
    for t in (0.3, 0.5, 0.8, 0.95):
        b, r = D.solve_banding(t, num_hashes=64)
        assert b * r <= 64 and b >= 1 and r >= 1
        # steepest point within a loose window of the target
        assert abs(D.lsh_threshold(b, r) - t) < 0.25
        picks[t] = r
    assert picks[0.3] <= picks[0.5] <= picks[0.8] <= picks[0.95]


def test_candidate_probability_s_curve():
    b, r = 8, 8
    t = D.lsh_threshold(b, r)
    assert D.candidate_probability(t - 0.2, b, r) < 0.5
    assert D.candidate_probability(min(t + 0.2, 0.999), b, r) > 0.5
    assert D.candidate_probability(0.0, b, r) == 0.0
    assert D.candidate_probability(1.0, b, r) == pytest.approx(1.0)


def test_fp_weight_shifts_solver_stricter():
    """Penalizing false positives should never shorten the bands."""
    _, r_bal = D.solve_banding(0.7, num_hashes=32)
    _, r_fp = D.solve_banding(0.7, num_hashes=32, fp_weight=10.0)
    assert r_fp >= r_bal


def test_minhash_decision_auto_banding(docs):
    out = D.minhash_dedup_decision(
        docs, num_hashes=16, band_size=None, threshold=0.5
    ).collect()
    kept = {r["doc_id"]: r["is_kept"] for r in out}
    assert kept[0] == 1
    assert kept[2] == 0  # exact dup of 0 dropped at any sane banding


def test_winnow_udf_matches_expression(docs):
    """The Arrow-vectorized winnow must produce the same fingerprint SET
    as the pure-expression form (integer arithmetic, no float slack)."""
    expr = TX.add_winnow_fingerprints(docs, k=3, window=2)
    udf = docs.withColumn(
        "fingerprints", TX.winnow_fingerprints_udf(k=3, window=2)(F.col("text"))
    )
    got_e = {r["doc_id"]: sorted(r["fingerprints"]) for r in expr.collect()}
    got_u = {r["doc_id"]: sorted(r["fingerprints"]) for r in udf.collect()}
    assert got_e == got_u
    assert got_e[5] == []  # empty doc -> empty set


def test_winnow_shared_substring_guarantee(spark):
    """Docs sharing a substring of length >= k+window-1 share a print."""
    k, w = 5, 4
    shared = "identical shared run of text"
    df = spark.createDataFrame(
        [(1, "prefix AAA " + shared), (2, shared + " ZZZ different tail")],
        "doc_id long, text string",
    )
    rows = TX.add_winnow_fingerprints(df, k=k, window=w).collect()
    sets = {r["doc_id"]: set(r["fingerprints"]) for r in rows}
    assert sets[1] & sets[2]


def test_blocked_cosine_pairs_matches_expression(spark):
    """BLAS-path pairwise cosine must agree with the expression form to
    float tolerance on the same label blocks."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)], str(i % 3))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    fast = {
        (r["left_id"], r["right_id"]): r["cosine_sim"]
        for r in SIM.blocked_cosine_pairs(df, ["label"], threshold=-1.0).collect()
    }
    e = df.select(
        "vec_id", "label", F.col("embedding").alias("v"),
        SIM.l2_norm(F.col("embedding")).alias("n"),
    )
    a, b = e.alias("a"), e.alias("b")
    slow = {
        (r["l"], r["r"]): r["sim"]
        for r in a.join(
            b,
            on=[F.col("a.label") == F.col("b.label"),
                F.col("a.vec_id") < F.col("b.vec_id")],
        )
        .select(
            F.col("a.vec_id").alias("l"), F.col("b.vec_id").alias("r"),
            (SIM.dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n"))).alias("sim"),
        )
        .collect()
    }
    assert set(fast) == set(slow)
    for k, v in slow.items():
        assert abs(fast[k] - v) < 1e-6


def test_resolve_dup_clusters_chains(spark):
    """a←b←c chains collapse to the root; singletons self-root."""
    decision = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (4, 3), (10, None), (11, 10), (20, None)],
        "doc_id long, dup_of long",
    )
    got = {
        r["doc_id"]: r["cluster_root"]
        for r in D.resolve_dup_clusters(decision).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_dedup_yield_curve_hand_computed(spark):
    """Exact clone (J=1.0, LSH-guaranteed candidate) drops at every
    threshold; the unique doc never does. Token yield = 8/13."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta eps"),
            (2, "alpha beta gamma delta eps"),
            (3, "xx yy zz"),
        ],
        "doc_id long, text string",
    )
    out = {r["threshold"]: r for r in D.dedup_yield_curve(df).collect()}
    assert set(out) == {0.5, 0.6, 0.7, 0.8, 0.9}
    for t, r in out.items():
        assert r["n_docs"] == 3 and r["n_tokens"] == 13, t
        assert r["n_dup_docs"] == 1 and r["n_dup_tokens"] == 5, t
        assert r["docs_kept_frac"] == round(2 / 3, 6), t
        assert r["tokens_kept_frac"] == round(8 / 13, 6), t


def test_dedup_yield_curve_empty_corpus(spark):
    """Zero-corpus guard: fractions are NULL (nullif), counts zero."""
    df = spark.createDataFrame([], "doc_id long, text string")
    rows = D.dedup_yield_curve(df).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_docs"] == 0 and r["n_dup_docs"] == 0
        assert r["docs_kept_frac"] is None
        assert r["tokens_kept_frac"] is None


def test_cluster_aware_split_no_leakage(spark):
    """Every member of a near-dup cluster lands in the SAME split
    (the leakage-free property), and buckets match the hand-computed
    md5(root) device."""
    import hashlib

    rows = [
        (1, "alpha beta gamma delta eps"),
        (2, "alpha beta gamma delta eps"),   # clone of 1
        (3, "alpha beta gamma delta eps"),   # clone of 1
        (9, "totally different words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in D.cluster_aware_split(df).collect()}
    assert {got[i]["cluster_root"] for i in (1, 2, 3)} == {1}
    assert len({got[i]["split"] for i in (1, 2, 3)}) == 1
    assert got[9]["cluster_root"] == 9
    for i in (1, 9):
        want = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100
        assert got[i]["bucket"] == want, i
        exp = "train" if want < 90 else ("val" if want < 95 else "test")
        assert got[i]["split"] == exp, i


def test_resolve_dup_clusters_plan_growth_bounded(spark):
    """VERDICT r6 item #4: per-round localCheckpoint truncates the
    lineage to a LogicalRDD leaf, so the final plan stays O(1) in
    iteration depth — plain caching cannot achieve this either way
    (leaked caches nest a level per round; correctly-unpersisted
    caches re-inline the full upstream into every dependent cached
    plan, doubling per round through the self-join). A 33-node path
    forces ~6 pointer-jumping rounds; the default (checkpointed) run's
    plan must stay small and bit-match the all-cache run."""
    n = 33
    decision = spark.createDataFrame(
        [(i, i - 1 if i else None) for i in range(n)],
        "doc_id long, dup_of long",
    )
    capped = D.resolve_dup_clusters(decision)
    got = {r["doc_id"]: r["cluster_root"] for r in capped.collect()}
    assert got == {i: 0 for i in range(n)}
    plan = capped._jdf.queryExecution().executedPlan().toString()
    # bottoms out at the checkpointed RDD scan, constant-size plan
    assert "ExistingRDD" in plan
    assert plan.count("Exchange") <= 6, plan.count("Exchange")
    uncapped = D.resolve_dup_clusters(decision, checkpoint_every=0)
    plan_u = uncapped._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < len(plan_u) / 2, (len(plan), len(plan_u))
    assert {r["doc_id"]: r["cluster_root"] for r in uncapped.collect()} == got


def test_q22_lsh_recall_vs_exact_blocked(spark):
    """q22's LSH-refined candidates must recover most of the exact
    same-(lang, source) J>=0.5 pairs — and every emitted pair must be one
    of them (no false positives: the verify step is exact)."""
    import __spark_entry__ as entrymod
    from big_data_project_datapipeline_spark.functions.dedup import token_hash_set
    from big_data_project_datapipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    toks = d.select(
        "doc_id", "lang", "source", token_hash_set(F.col("text")).alias("s")
    )
    a, b = toks.alias("a"), toks.alias("b")
    exact = {
        (r["l"], r["r"])
        for r in a.join(
            b,
            on=[
                F.col("a.lang") == F.col("b.lang"),
                F.col("a.source") == F.col("b.source"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("l"),
            F.col("b.doc_id").alias("r"),
            (
                F.size(F.array_intersect("a.s", "b.s")).cast("double")
                / F.size(F.array_union("a.s", "b.s"))
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.5)
        .collect()
    }
    got = {
        (r["left_id"], r["right_id"])
        for r in entrymod.queries()["q22_ngram_jaccard"](spark, sf).collect()
    }
    assert got <= exact  # exact verify → zero false positives
    assert len(got) / len(exact) >= 0.75  # LSH recall on this corpus


def test_q32_srp_recall_vs_exact_within_label(spark):
    """q32's SRP sub-blocking must recover most exact within-label
    cosine>=0.3 pairs, with zero false positives (verify is exact)."""
    import __spark_entry__ as entrymod
    from big_data_project_datapipeline_spark.functions.similarity import dot, l2_norm
    from big_data_project_datapipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    e = emb.select(
        "vec_id", "label", F.col("embedding").alias("v"),
        l2_norm(F.col("embedding")).alias("n"),
    )
    a, b = e.alias("a"), e.alias("b")
    exact = {
        (r["l"], r["r"])
        for r in a.join(
            b,
            on=[
                F.col("a.label") == F.col("b.label"),
                F.col("a.vec_id") < F.col("b.vec_id"),
            ],
        )
        .select(
            F.col("a.vec_id").alias("l"),
            F.col("b.vec_id").alias("r"),
            (dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n"))).alias("s"),
        )
        .filter(F.col("s") >= 0.3)
        .collect()
    }
    got = {
        (r["left_id"], r["right_id"])
        for r in entrymod.queries()["q32_embedding_neardup"](spark, sf).collect()
    }
    assert got <= exact
    assert len(got) / len(exact) >= 0.7


def test_word_shingles_and_hashes(spark):
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "x y"), (2, None)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", D.word_shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    assert out[0] == ["a b c", "b c d"]  # sliding k-grams, in order
    assert out[1] == []  # shorter than k -> empty, not error
    hashes = (
        df.filter("doc_id = 0")
        .select(D.shingle_hash_set(F.col("text"), 3).alias("h"))
        .collect()[0]["h"]
    )
    assert len(hashes) == 2 and all(isinstance(h, int) for h in hashes)
    # engine-portable digest: matches md5 of the shingle text
    expect = int(hashlib.md5(b"a b c").hexdigest()[:15], 16)
    assert expect in hashes


def test_decontaminate_flags_only_real_overlaps(spark):
    """q56 invariants on real data: benchmark docs never flagged; every
    flagged doc shares >=1 exact word 4-gram with some benchmark doc."""
    import __spark_entry__ as entrymod
    from big_data_project_datapipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    flagged = {
        r["doc_id"]: r["n_overlap"]
        for r in entrymod.queries()["q56_decontaminate"](spark, sf).collect()
    }
    assert flagged and all(doc % 10 != 0 for doc in flagged)
    d = load_table(spark, sf, "documents")
    sh = d.select(
        "doc_id", F.explode(D.shingle_hash_set(F.col("text"), 4)).alias("h")
    )
    bench_hashes = {
        r["h"] for r in sh.filter("doc_id % 10 = 0").collect()
    }
    some = list(flagged)[:5]
    for doc in some:
        mine = {r["h"] for r in sh.filter(F.col("doc_id") == doc).collect()}
        assert len(mine & bench_hashes) == flagged[doc]


def test_scrub_text_crafted(spark):
    """PII scrub on inputs the synthetic corpus lacks: URLs (incl. one
    containing '@'), emails, IPv4s, whitespace collapse."""
    rows = [
        (1, "see https://ex.com/a?u=x@y.z and http://b.io now"),
        (2, "mail me: alice.smith+tag@sub.example.co.uk thanks"),
        (3, "host 192.168.0.1 and  10.0.0.255\tlisted"),
        (4, "plain   text   only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = F.col("text")
    counts = TX.scrub_counts(t)
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            counts["n_urls"].alias("u"),
            counts["n_emails"].alias("e"),
            counts["n_ips"].alias("i"),
            TX.scrub_text(t).alias("c"),
        ).collect()
    }
    # URL scrub wins over the email inside the URL (scrub order)
    assert out[1]["u"] == 2 and out[1]["c"] == "see <URL> and <URL> now"
    assert out[2]["e"] == 1 and out[2]["c"] == "mail me: <EMAIL> thanks"
    assert out[3]["i"] == 2 and out[3]["c"] == "host <IP> and <IP> listed"
    assert out[4]["c"] == "plain text only"


def test_repetition_metrics_python_parity(spark):
    """Gopher repetition fractions vs a literal Python computation."""
    from collections import Counter

    rows = [
        (1, "a a a b c"),              # modal unigram 'a' 3/5
        (2, "x y x y x y"),            # modal bigram 'x y' 3/5
        (3, "p q r p q r p q r"),      # repeated trigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in TX.add_repetition_metrics(df).collect()}
    for doc_id, text in rows:
        toks = text.split()
        for n, col in [(1, "top_unigram_frac"), (2, "top_bigram_frac")]:
            grams = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            expect = Counter(grams).most_common(1)[0][1] / len(grams)
            assert got[doc_id][col] == pytest.approx(expect), (doc_id, col)
        tri = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        expect_dup = 1.0 - len(set(tri)) / len(tri)
        assert got[doc_id]["dup_trigram_frac"] == pytest.approx(expect_dup)
        assert got[doc_id]["n_tokens"] == len(toks)


def test_tfidf_top_terms_hand_computed(spark):
    """tf·ln(N/df) on a 3-doc corpus, rank ties broken by token."""
    import math as _m

    rows = [
        (1, "apple apple banana"),
        (2, "apple cherry"),
        (3, "banana banana banana cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = TX.tf_idf_top_terms(df, k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 df=2 -> 2*ln(1.5); banana tf=1 df=2 -> ln(1.5)
    d1 = {r["token"]: r for r in by_doc[1]}
    assert d1["apple"]["rank"] == 1
    assert d1["apple"]["tfidf"] == pytest.approx(
        round(2 * _m.log(3 / 2), 6)
    )
    assert d1["banana"]["rank"] == 2
    # doc 3: banana 3*ln(1.5) beats cherry ln(1.5)
    d3 = {r["token"]: r for r in by_doc[3]}
    assert d3["banana"]["rank"] == 1 and d3["cherry"]["rank"] == 2
    # every rank run is 1..k contiguous
    for doc, rs in by_doc.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))


def test_quantize_int8_invariants(spark):
    """Quantization audit: scale, saturation, reconstruction error bound
    (|x - q*scale| < scale since q = floor(x/scale))."""
    rows = [
        (1, [1.0, -1.0, 0.5, 0.0]),
        (2, [0.001, 0.002, -0.003, 0.004]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector -> scale 0, q=0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in SIM.quantize_int8_metrics(df).collect()}
    assert out[1]["scale"] == pytest.approx(1.0 / 127.0)
    assert out[1]["n_sat"] >= 1  # x = max|x| lands exactly on 127
    assert out[3]["scale"] == 0.0 and out[3]["sum_q"] == 0
    assert out[3]["recon_err"] == 0.0
    for vid, vec in rows[:2]:
        scale = out[vid]["scale"]
        # floor-quantization error per lane < scale; L2 < scale*sqrt(dim)
        assert out[vid]["recon_err"] < scale * (len(vec) ** 0.5)


def test_chunk_dedup_keep_first(spark):
    """CCNet chunk dedup: later occurrences of a chunk drop corpus-wide,
    first (doc_id, pos) occurrence survives; partial last chunk included."""
    from big_data_project_datapipeline_spark.functions.dedup import chunk_dedup

    rows = [
        (1, "a b c d e f"),        # chunks: "a b c", "d e f"
        (2, "a b c x y z"),        # "a b c" dup -> dropped
        (3, "d e f"),              # whole doc is a dup -> empty text
        (4, "x y z q r s t"),      # "x y z" dup of doc 2; partial tail "t"
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in chunk_dedup(df, k=3).collect()}
    assert out[1]["text_dedup"] == "a b c d e f"
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 2)
    assert out[2]["text_dedup"] == "x y z"
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (2, 1)
    assert out[3]["text_dedup"] == ""
    assert (out[3]["n_chunks"], out[3]["n_kept"]) == (1, 0)
    # doc 4: "x y z" dropped (doc 2 owns it), "q r s" + partial "t" kept
    assert out[4]["text_dedup"] == "q r s t"
    assert (out[4]["n_chunks"], out[4]["n_kept"]) == (3, 2)


def test_exact_substring_dedup_hand_computed(spark):
    """Lee-et-al ExactSubstr over window-grams: a duplicated 3-token span
    is scrubbed from every non-first occurrence; overlapping duplicated
    spans merge (covered positions counted once); short docs untouched."""
    from big_data_project_datapipeline_spark.functions.dedup import (
        exact_substring_dedup,
    )

    rows = [
        (1, "a b c d e"),      # owns first occurrences of "a b c"/"b c d"
        (2, "x a b c d y"),    # both spans dup here -> positions 1-4 out
        (3, "p q r"),          # unique window -> intact
        (4, "a b"),            # shorter than the window -> intact
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in exact_substring_dedup(df, window=3).collect()
    }
    assert out[1]["text_dedup"] == "a b c d e"
    assert (out[1]["n_tokens"], out[1]["n_removed"]) == (5, 0)
    # doc 2: spans [1,3] and [2,4] overlap -> union {1,2,3,4} removed once
    assert out[2]["text_dedup"] == "x y"
    assert (out[2]["n_tokens"], out[2]["n_removed"]) == (6, 4)
    assert out[3]["text_dedup"] == "p q r"
    assert (out[4]["n_tokens"], out[4]["n_removed"]) == (2, 0)


def test_dup_span_coverage_counts_all_occurrences(spark):
    """Coverage counts EVERY occurrence of a repeated gram (first
    included) — the diagnostic complement of q99's keep-first removal."""
    from big_data_project_datapipeline_spark.functions.dedup import (
        dup_span_coverage,
    )

    rows = [
        (1, "a b c d e", "s1"),  # owns "a b c" — still covered (pos 0-2)
        (2, "a b c x y", "s1"),  # dup "a b c" covers pos 0-2
        (3, "p q r s t", "s2"),  # unique -> untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["source"]: r for r in dup_span_coverage(df, window=3).collect()
    }
    s1 = out["s1"]
    assert (s1["n_docs"], s1["total_tokens"], s1["dup_tokens"]) == (2, 10, 6)
    assert s1["dup_token_frac"] == 0.6
    assert (s1["docs_affected"], s1["docs_affected_frac"]) == (2, 1.0)
    s2 = out["s2"]
    assert (s2["dup_tokens"], s2["docs_affected"]) == (0, 0)


def test_unigram_logprob_hand_computed(spark):
    """Tiny corpus: p(a)=3/6, p(b)=2/6, p(c)=1/6; per-doc mean log-prob
    and ppl = exp(-mean) match hand math."""
    from big_data_project_datapipeline_spark.functions.text import (
        unigram_logprob_scores,
    )

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob_scores(df).collect()}
    lp1 = (2 * math.log(3 / 6) + math.log(2 / 6)) / 3
    lp2 = (math.log(3 / 6) + math.log(2 / 6) + math.log(1 / 6)) / 3
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 3
    assert out[1]["avg_logprob"] == pytest.approx(round(lp1, 6))
    assert out[2]["avg_logprob"] == pytest.approx(round(lp2, 6))
    assert out[2]["ppl"] == pytest.approx(round(math.exp(-lp2), 6))
    # the rarer-token doc scores lower (higher perplexity) — the filter's
    # actual decision axis
    assert out[2]["avg_logprob"] < out[1]["avg_logprob"]
    assert out[2]["ppl"] > out[1]["ppl"]


def test_source_mix_rebalance_invariants(spark):
    """Uniform-target rebalance: underrepresented sources keep everything
    (rate 1), overrepresented ones are cut toward N/k, shares sum to 1."""
    import __spark_entry__ as e

    out = e.q63_source_mix_rebalance(spark, "/root/testdata/sf0.001").collect()
    rows = {r["source"]: r for r in out}
    n = sum(r["n_total"] for r in out)
    k = len(out)
    for r in out:
        assert 0 < r["keep_rate"] <= 1.0
        assert r["n_kept"] <= r["n_total"]
        if r["n_total"] <= n / k:  # underrepresented -> keep all
            assert r["keep_rate"] == 1.0 and r["n_kept"] == r["n_total"]
    assert sum(r["realized_share"] for r in out) == pytest.approx(1.0, abs=1e-4)
    # deterministic: same selection on re-run
    again = {r["source"]: r["n_kept"]
             for r in e.q63_source_mix_rebalance(spark, "/root/testdata/sf0.001").collect()}
    assert again == {s: r["n_kept"] for s, r in rows.items()}


def test_semantic_dedup_decision_matches_pairs(spark):
    """q64 decision invariant: a vector drops iff q32 reports a ≥τ pair
    in which it is the larger id — so every near-dup group keeps its
    smallest id, and nothing without a qualifying neighbor drops."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    pairs = [
        (r["left_id"], r["right_id"])
        for r in e.q32_embedding_neardup(spark, sf).collect()
        if r["cosine_sim"] >= 0.35
    ]
    expected_drops = {r for _, r in pairs}
    out = {r["vec_id"]: r for r in e.q64_semantic_dedup(spark, sf).collect()}
    got_drops = {v for v, r in out.items() if r["dropped"] == 1}
    assert got_drops == expected_drops and len(got_drops) > 0
    for left, right in pairs:
        assert out[right]["n_dup_neighbors"] >= 1
        assert out[right]["max_sim"] >= 0.35
    # smallest id in any pair never drops unless it is also a right side
    lefts_only = {l for l, _ in pairs} - expected_drops
    for v in lefts_only:
        assert out[v]["dropped"] == 0


def test_sequence_packing_hand_computed(spark):
    """Single shard, budget 4: offsets are the running concatenation,
    windows are offset//4 .. (end-1)//4, straddle flags exact."""
    from big_data_project_datapipeline_spark.functions.text import (
        sequence_packing,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g h"), (3, "i"), (4, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in sequence_packing(df, budget=4, n_shards=1).collect()
    }
    assert 4 not in out  # zero-token doc excluded
    # doc1: tokens 0..2 -> window 0 only
    assert (out[1]["token_offset"], out[1]["first_window"],
            out[1]["last_window"], out[1]["straddles"]) == (0, 0, 0, 0)
    # doc2: tokens 3..7 -> windows 0..1, straddles
    assert (out[2]["token_offset"], out[2]["first_window"],
            out[2]["last_window"], out[2]["straddles"]) == (3, 0, 1, 1)
    # doc3: token 8 -> window 2 exactly at a boundary, no straddle
    assert (out[3]["token_offset"], out[3]["first_window"],
            out[3]["last_window"], out[3]["straddles"]) == (8, 2, 2, 0)


def test_train_val_split_group_constant(spark):
    """q66: every doc of a source lands in the same split (leakage-free
    by construction) and the assignment is deterministic across runs."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    rows = e.q66_train_val_split(spark, sf).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_source.values())
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    again = {r["doc_id"]: r["split"] for r in e.q66_train_val_split(spark, sf).collect()}
    assert again == {r["doc_id"]: r["split"] for r in rows}


def test_pq_encode_exact_centroids_zero_error(spark):
    # Codebooks: m=2 subspaces of 2 dims, k=2 centroids each.
    books = [
        [[0.0, 0.0], [1.0, 1.0]],
        [[2.0, 2.0], [3.0, 3.0]],
    ]
    df = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 3.0, 3.0]),   # codes (0, 1), error 0
            (1, [1.0, 1.0, 2.0, 2.0]),   # codes (1, 0), error 0
            (2, [0.0, 0.0, 2.0, 2.5]),   # codes (0, 0), err 0.25/4
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in SIM.pq_encode(df, books).collect()}
    assert list(out[0].codes) == [0, 1] and out[0].recon_mse == 0.0
    assert list(out[1].codes) == [1, 0] and out[1].recon_mse == 0.0
    assert list(out[2].codes) == [0, 0]
    assert out[2].recon_mse == pytest.approx(0.25 / 4)


def test_pq_train_error_shrinks_with_k(spark):
    import random

    rng = random.Random(7)
    centers = [[float(5 * c + d) for d in range(4)] for c in range(4)]
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, [x + rng.uniform(-0.1, 0.1) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mse = {}
    for k in (1, 4):
        books = SIM.pq_train(df, m=2, k=k, sample_per_centroid=256)
        enc = SIM.pq_encode(df, books)
        mse[k] = enc.agg(F.avg("recon_mse")).collect()[0][0]
    assert mse[4] < mse[1] * 0.25  # 4 planted clusters: big win over k=1
    assert mse[4] < 0.01


def test_pq_audit_grouped_invariants(spark):
    rows = [
        (i, [float(i % 3)] * 4, i % 2) for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    books = SIM.pq_train(df, m=2, k=4, sample_per_centroid=64)
    out = SIM.pq_audit(df, books, group_col="label").collect()
    assert {r.label for r in out} == {0, 1}
    for r in out:
        assert r.n_vecs == 15
        assert 0.0 < r.codebook_utilization <= 1.0
        assert r.mean_recon_mse <= r.max_recon_mse


def test_simhash_neardup_complete_vs_bruteforce(spark):
    # Pigeonhole completeness: the block-index candidate set must recover
    # EVERY pair within max_distance — compare against brute-force
    # all-pairs popcount over the python-computed signatures.
    import itertools

    texts = [
        "the cat sat on the mat today",
        "the cat sat on the mat yesterday",   # near-identical token set
        "the cat sat on a mat today",
        "totally different words entirely here now",
        "the cat sat on the mat today",       # exact dup of 0
        "quick brown fox jumps over lazy dog",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sigs = {
        r["doc_id"]: r["simhash"] for r in D.simhash(df, bits=32).collect()
    }
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_near_duplicates(df, max_distance=3).collect()
    }
    assert got == want
    assert (0, 4, 0) in got  # the exact dup pair at distance 0


def test_simhash_neardup_rejects_bad_blocking(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        D.simhash_near_duplicates(df, max_distance=4, bits=32)  # 32 % 5 != 0


def test_ivfpq_recall_vs_exact_l2(spark):
    """IVFPQ: recall must rise with the refine shortlist (the FAISS
    IndexRefineFlat dial) and clear an achievable floor on the
    structured embeddings table. This corpus' within-cluster neighbor
    gaps are noise-scale (ADC↔exact corr ≈ 0.23 inside the true
    top-50), so pure ADC fine-ranking is intrinsically hard here — the
    refine step is exactly what FAISS prescribes for that regime."""
    from big_data_project_datapipeline_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 5")
    # exact L2 top-5 (brute force, python-side for 500 x 5 pairs)
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: r.embedding for r in rows}
    exact = set()
    for q in range(5):
        d = sorted(
            (
                (sum((a - b) ** 2 for a, b in zip(vecs[q], vecs[i])), i)
                for i in vecs
                if i != q
            ),
        )[:5]
        exact |= {(q, i) for _, i in d}

    def recall(refine):
        got = {
            (r.query_id, r.neighbor_id)
            for r in SIM.ivfpq_topk(
                emb, queries, k=5, n_lists=8, n_probe=4,
                m=8, k_sub=16, refine=refine,
            ).collect()
        }
        return len(exact & got) / len(exact)

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1, (r1, r8)
    assert r8 >= 0.5, f"IVFPQ refined recall too low: {r8}"


def test_ivfpq_code_shape_and_determinism(spark):
    from big_data_project_datapipeline_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 3")
    a = SIM.ivfpq_topk(emb, queries, k=3, n_lists=8, n_probe=4).collect()
    b = SIM.ivfpq_topk(emb, queries, k=3, n_lists=8, n_probe=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # no RNG state
    assert {r.query_id for r in a} == {0, 1, 2}
    for r in a:
        assert 1 <= r.rank <= 3 and r.approx_dist >= 0.0


def test_canonical_selection_prefers_quality_over_min_id(spark):
    import __spark_entry__ as E
    import os
    import tempfile

    # docs 0 and 1 are exact near-dups (same token set, jaccard 1.0) but
    # doc 0 is low quality (no stopwords after 'the' removal? keep it
    # simple: doc 0 short/degenerate, doc 1 the good copy). q51's policy
    # keeps min id; canonical selection must keep the HIGH-QUALITY one.
    good = ("the quick brown fox is running with the lazy dog "
            "and it is that fast for everyone involved")
    # same token multiset as `good` minus stopword signal is hard to craft;
    # instead make doc 0 a token-set duplicate with quality-killing shape:
    # identical DISTINCT token set (MinHash sees sets), but avg token len
    # pushed out of band by massive repetition of the longest word.
    bad = " ".join(good.split() + ["everyone"] * 200)
    docs = [
        (0, bad, "en", "s1", len(bad)),
        (1, good, "en", "s1", len(good)),
        (2, "completely different text here now", "en", "s1", 34),
    ]
    df = spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r.cluster_root: r
            for r in E.q119_canonical_selection(spark, d).collect()
        }
    cluster = out[0]  # root = min member id = 0
    assert cluster.n_members == 2
    assert cluster.canonical_id == 1  # quality beats min-id
    assert cluster.best_quality >= 0.75


def test_triangle_count_crafted_graphs(spark):
    from big_data_project_datapipeline_spark.operators.graph import (
        triangle_count,
    )

    # two triangles sharing edge (1,2): {1,2,3} and {1,2,4}; plus a
    # dangling path 4-5; duplicate + reversed + self-loop edges thrown in
    edges = [
        (1, 2), (2, 3), (3, 1),
        (2, 1),            # reversed duplicate
        (1, 4), (2, 4),
        (4, 5), (5, 5),    # path + self-loop
        (1, 2),            # exact duplicate
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = triangle_count(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (5, 6, 2)
    # star graph: no triangles, hub generates zero wedges
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "src long, dst long"
    )
    r2 = triangle_count(star).collect()[0]
    assert (r2.n_nodes, r2.n_edges, r2.n_triangles) == (9, 8, 0)
    # complete graph K5: C(5,3) = 10 triangles
    k5 = spark.createDataFrame(
        [(i, j) for i in range(5) for j in range(i + 1, 5)],
        "src long, dst long",
    )
    assert triangle_count(k5).collect()[0].n_triangles == 10


def test_ivfpq_split_pipeline_matches_oneshot(spark, tmp_path):
    """Build-once/search-many must equal the one-shot call bit-for-bit,
    including through JSON model persistence and a parquet index
    round-trip partitioned by list_id."""
    import os

    from big_data_project_datapipeline_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id < 4")
    oneshot = sorted(
        map(tuple, SIM.ivfpq_topk(emb, queries, k=4, n_lists=8).collect())
    )
    model = SIM.ivfpq_train(emb, n_lists=8)
    mpath = str(tmp_path / "model.json")
    SIM.save_ivfpq_model(model, mpath)
    model2 = SIM.load_ivfpq_model(mpath)
    assert model2 == model  # exact float round-trip through JSON
    ipath = str(tmp_path / "index")
    SIM.ivfpq_encode(emb, model2).write.partitionBy("list_id").parquet(ipath)
    index = spark.read.parquet(ipath)
    split = sorted(
        map(
            tuple,
            SIM.ivfpq_search(
                index, model2, queries, k=4, corpus=emb
            ).collect(),
        )
    )
    assert split == oneshot
    # the persisted index is hive-partitioned by list for probe pruning
    assert any(d.startswith("list_id=") for d in os.listdir(ipath))


def test_ivfpq_search_exclude_self_flag(spark):
    # With an unrelated query id space, exclude_self=False must allow a
    # corpus vector whose id collides with the query id to be returned.
    from big_data_project_datapipeline_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    model = SIM.ivfpq_train(emb, n_lists=8)
    index = SIM.ivfpq_encode(emb, model)
    # query vector IS corpus vector 7, carrying the colliding id 7
    q7 = emb.filter("vec_id = 7")
    incl = SIM.ivfpq_search(
        index, model, q7, k=3, corpus=emb, refine=4, exclude_self=False
    ).collect()
    # its exact match (distance 0) must now appear at rank 1 as itself
    top = min(incl, key=lambda r: r.rank)
    assert top.neighbor_id == 7 and top.approx_dist == 0.0
    excl = SIM.ivfpq_search(
        index, model, q7, k=3, corpus=emb, refine=4, exclude_self=True
    ).collect()
    assert all(r.neighbor_id != 7 for r in excl)


def test_cosine_zero_norm_vector_does_not_crash(spark):
    # Spark 4 ANSI mode: a bare division would abort the job on the
    # first zero-norm vector (review fix) — it must rank neutral (0.0).
    vecs = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = SIM.cosine_topk(df, df.filter("vec_id = 0"), k=2).collect()
    sims = {r.neighbor_id: r.cosine_sim for r in out}
    assert sims[2] == 0.0  # zero-norm corpus row scored neutral, no crash
    # zero-norm QUERY also survives
    out2 = SIM.cosine_topk(df, df.filter("vec_id = 2"), k=2).collect()
    assert all(r.cosine_sim == 0.0 for r in out2)


def test_srp_bucket_dim_mismatch_raises(spark):
    import pytest as _pytest
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    bad = df.select(SIM.srp_bucket(F.col("embedding"), 2, dim=64).alias("b"))
    with _pytest.raises(Exception, match="srp_bucket: dim=64"):
        bad.collect()


def test_quantize_int8_never_emits_minus_128(spark):
    # floor(-absmax/scale) can hit -128 for ~14% of absmax values —
    # pinned on a known-bad absmax (review fix).
    df = spark.createDataFrame(
        [(0, [2.8357193047241087, -2.8357193047241087])],
        "vec_id long, embedding array<double>",
    )
    from big_data_project_datapipeline_spark.functions.similarity import (
        quantize_int8_metrics,
    )

    r = quantize_int8_metrics(df).collect()[0]
    assert r.n_sat == 2 and r.sum_q == 0  # +127 and -127, not -128


def test_pca_project_k_exceeding_dim_raises(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="exceeds"):
        SIM.pca_project(df, k=5)


def test_lloyd_fit_empty_sample_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        SIM._lloyd_fit([], k=4)


def test_blocked_cosine_pairs_string_ids(spark):
    df = spark.createDataFrame(
        [("a", 0, [1.0, 0.0]), ("b", 0, [1.0, 0.0]), ("c", 1, [0.0, 1.0])],
        "vec_id string, label int, embedding array<float>",
    )
    rows = SIM.blocked_cosine_pairs(
        df, ["label"], threshold=0.5
    ).collect()
    assert {(r.left_id, r.right_id) for r in rows} == {("a", "b")}


def test_minhash_pipeline_survives_empty_docs(spark):
    # Review regressions: empty/whitespace/null docs must neither crash
    # the jaccard verify (0/0 under ANSI) nor flood one LSH bucket with
    # all-pairs candidates.
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "real text here okay"),
         (5, ""), (6, "real text here fine")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in D.minhash_dedup_decision(
        df, num_hashes=16, band_size=2, threshold=0.5
    ).collect()}
    # empty docs are kept as-is (nothing to match on), not paired
    for i in (1, 2, 3, 5):
        assert out[i].is_kept == 1 and out[i].dup_of is None
    # the real near-dup pair still resolves
    assert out[6].dup_of == 4 or out[6].is_kept == 1


def test_dup_span_coverage_all_empty_group(spark):
    df = spark.createDataFrame(
        [(1, "", "g1"), (2, "  ", "g1"), (3, "a b c d e f g h i j", "g2")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in D.dup_span_coverage(df, window=3).collect()}
    assert out["g1"].dup_token_frac == 0.0  # no ANSI crash, defined 0


def test_shingle_fingerprint_null_vs_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r.fp for r in df.select(
        "doc_id", TX.shingle_fingerprint(F.col("text")).alias("fp")
    ).collect()}
    assert rows[1] is None            # missing text stays NULL
    assert rows[2] is not None        # empty text keeps a fingerprint


def test_bm25_query_terms_case_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "spark pipeline engine"), (2, "other words entirely")],
        "doc_id long, text string",
    )
    out = TX.bm25_topk(df, ["Spark", "PIPELINE"], k=2).collect()
    assert out and out[0].doc_id == 1 and out[0].bm25 > 0


def test_dvec_expr_bit_equals_lit(spark):
    """The F.expr-string literal builders (plan-build fast path) must be
    BIT-identical to per-element F.lit construction — repr() is
    shortest-round-trip and Spark's D-suffix literal parses via
    Double.parseDouble, so every IEEE double survives, including
    negative zero, denormals, and exponent forms."""
    import struct

    from pyspark.sql import functions as F

    from big_data_project_datapipeline_spark.functions.similarity import (
        _dmat_expr,
        _dvec_expr,
    )

    tricky = [
        0.1,
        -0.0,
        1e-300,
        5e-324,
        1.7976931348623157e308,
        -2.5,
        1 / 3,
        123456789.123456789,
    ]
    mat = [tricky, [x / 7 for x in tricky]]
    row = spark.range(1).select(
        _dvec_expr(tricky).alias("v"),
        F.array(*[F.lit(float(x)) for x in tricky]).alias("vl"),
        _dmat_expr(mat).alias("m"),
    ).first()
    bits = lambda xs: [struct.pack(">d", x) for x in xs]  # noqa: E731
    assert bits(row["v"]) == bits(row["vl"]) == bits(tricky)
    assert [bits(r) for r in row["m"]] == [bits(r) for r in mat]


def test_dvec_expr_rejects_non_finite():
    import math

    import pytest as _pytest

    from big_data_project_datapipeline_spark.functions.similarity import (
        _dvec_sql,
    )

    for bad in (math.inf, -math.inf, math.nan):
        with _pytest.raises(ValueError):
            _dvec_sql([1.0, bad])


# ---------------- near-dup eval decontamination (q229, round-10)


class TestNeardupDecontaminate:
    def _docs(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        # doc 1 = eval benchmark; doc 10 = token-set clone of it
        # (J = 1.0 -> the LSH candidate is guaranteed, not
        # band-probabilistic — the q200 fixture convention);
        # doc 11 = clean; docs 12/13 = train-train clones (must NOT
        # flag each other: the screen is train-vs-eval only)
        rows = [
            (1, "alpha beta gamma delta epsilon zeta", "eval"),
            (10, "zeta epsilon delta gamma beta alpha", "train"),
            (11, "totally different words nothing shared here", "train"),
            (12, "red green blue cyan magenta yellow", "train"),
            (13, "yellow magenta cyan blue green red", "train"),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    def test_flags_eval_clone_only(self, spark):
        from pyspark.sql import functions as F

        from big_data_project_datapipeline_spark.functions.dedup import (
            neardup_decontaminate,
        )

        out = {
            r["doc_id"]: r
            for r in neardup_decontaminate(
                self._docs(spark), F.col("source") == "eval"
            ).collect()
        }
        # eval doc excluded from the output; every train doc present
        assert set(out) == {10, 11, 12, 13}
        assert out[10]["contaminated"] and out[10]["contaminated_by"] == 1
        assert out[10]["jaccard"] == 1.0
        # train-train clones are NOT contamination
        assert not out[12]["contaminated"] and not out[13]["contaminated"]
        assert out[12]["contaminated_by"] is None
        # the clean doc has no candidate at all
        assert out[11]["jaccard"] is None and not out[11]["contaminated"]

    def test_subthreshold_match_reports_but_does_not_flag(self, spark):
        from pyspark.sql import functions as F

        from big_data_project_datapipeline_spark.functions.dedup import (
            neardup_decontaminate,
        )

        # 5 shared + 3 distinct tokens: J = 5/11 ~ 0.4545 — when the
        # bands collide the match is reported with its jaccard but not
        # flagged at 0.8; with a HIGH threshold nothing can flag
        rows = [
            (1, "a b c d e f g h", "eval"),
            (2, "a b c d e x y z", "train"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        out = neardup_decontaminate(
            docs, F.col("source") == "eval", threshold=0.8
        ).first()
        assert not out["contaminated"]
        if out["jaccard"] is not None:  # band-probabilistic candidate
            assert out["jaccard"] == pytest.approx(5.0 / 11.0, abs=1e-6)
            assert out["contaminated_by"] is None
