"""LLM-pipeline operator tests: dedup, similarity, text analysis,
multimodal plumbing — DuckDB or numpy/pandas oracles."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal_duck

from sclera_spark.llm import (
    ann_topk,
    cosine_topk,
    dedup_exact,
    doc_fingerprint,
    language_id,
    minhash_dup_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    quality_scores,
    simhash,
    simhash_dup_pairs,
    token_count,
)
from sclera_spark.llm.multimodal import (
    audio_features,
    frame_sample,
    image_features,
    synthetic_assets,
)


def test_dedup_exact(tables, duck):
    out = dedup_exact(tables["documents"], on=["text"], id_col="doc_id")
    oracle = """
    SELECT d.* FROM documents d
    JOIN (SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text) k
      ON d.doc_id = k.doc_id
    """
    assert_df_equal_duck(out, duck, oracle)


def test_minhash_finds_planted_dups(spark):
    base = [
        "the quick brown fox jumps over the lazy dog again and again in the field",
        "completely different text about spark and distributed query engines at scale",
        "a third document mentioning neither foxes nor spark just weather and tea",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i * 10, t))
        rows.append((i * 10 + 1, t.replace("the", "a", 1)))  # near-dup
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_dup_pairs(df, threshold=0.5, num_perm=64, bands=32, shingle_k=4).collect()
    got = {(r.a_id, r.b_id) for r in pairs}
    assert {(0, 1), (10, 11), (20, 21)} <= got
    # no cross-document false positives
    assert all(a // 10 == b // 10 for a, b in got)
    kept = minhash_dedup(df, threshold=0.5, num_perm=64, bands=32, shingle_k=4)
    assert kept.count() == 3


def test_minhash_dedup_transitive_cluster(spark):
    # A~B and B~C but A!~C: the component must collapse to exactly one
    # survivor (the smallest id), which the round-1 greedy drop missed
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = a.replace("alpha beta gamma", "alpha beta XXXXX")
    c = b.replace("iota kappa lambda mu", "iota kappa YYYYY ZZZZZ")
    other = "completely unrelated text about weather patterns over the southern ocean"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (9, other)], "doc_id long, text string"
    )
    pairs = minhash_dup_pairs(df, threshold=0.5, num_perm=64, bands=32, shingle_k=4)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert (1, 2) in got and (2, 3) in got
    kept = sorted(
        r.doc_id
        for r in minhash_dedup(
            df, threshold=0.5, num_perm=64, bands=32, shingle_k=4
        ).collect()
    )
    assert kept == [1, 9]


def test_connected_components_path_graph(spark):
    from sclera_spark.llm.dedup import connected_components

    # a 12-node path plus a separate triangle: pointer jumping must close
    # the path in O(log n) rounds
    edges = [(i, i + 1) for i in range(11)] + [(100, 101), (101, 102), (100, 102)]
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    comp = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert all(comp[i] == 0 for i in range(12))
    assert all(comp[i] == 100 for i in (100, 101, 102))


def test_simhash_deterministic_and_near(spark):
    df = spark.createDataFrame(
        [
            (1, "spark is a distributed engine for large scale data processing"),
            (2, "spark is a distributed engine for large scale data processing!"),
            (3, "cats purr softly on warm window sills during quiet winter afternoons"),
        ],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert sigs[1] == sigs[2]  # punctuation stripped -> identical tokens
    pairs = simhash_dup_pairs(df, max_hamming=3).collect()
    got = {(r.a_id, r.b_id) for r in pairs}
    assert (1, 2) in got and (1, 3) not in got


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="quadratic"):
        ngram_jaccard_pairs(df, n=2, threshold=0.3)
    pairs = ngram_jaccard_pairs(df, n=2, threshold=0.3, allow_all_pairs=True).collect()
    got = {(r.a_id, r.b_id): r.jaccard for r in pairs}
    assert (1, 2) in got and (1, 3) not in got
    # oracle: bigram sets computed by hand
    a = {"alpha beta", "beta gamma", "gamma delta", "delta epsilon", "epsilon zeta"}
    b = {"alpha beta", "beta gamma", "gamma delta", "delta epsilon", "epsilon eta"}
    assert abs(got[(1, 2)] - len(a & b) / len(a | b)) < 1e-12


def test_cosine_topk_vs_numpy(tables):
    pdf = tables["embeddings"].toPandas()
    dim = len(pdf["embedding"].iloc[0])
    q = [1.0] + [0.0] * (dim - 1)
    out = cosine_topk(tables["embeddings"], q, k=5).collect()
    mat = np.vstack(pdf["embedding"].to_numpy())
    sims = mat[:, 0] / np.linalg.norm(mat, axis=1)
    order = np.lexsort((pdf["vec_id"].to_numpy(), -sims))
    expect = [(int(pdf["vec_id"].iloc[i]), float(sims[i])) for i in order[:5]]
    got = [(r.vec_id, r.cosine) for r in out]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for g, e in zip(got, expect):
        assert abs(g[1] - e[1]) < 1e-5


def test_ann_topk_subset_of_bucket(tables):
    pdf = tables["embeddings"].limit(1).toPandas()
    q = list(pdf["embedding"].iloc[0])
    out = ann_topk(tables["embeddings"], q, k=3, n_bits=4).collect()
    assert len(out) >= 1
    # the query vector itself must be its own nearest neighbor
    assert out[0].vec_id == int(pdf["vec_id"].iloc[0])
    assert out[0].cosine > 0.999999


def test_ivf_topk(tables):
    from sclera_spark.llm import ivf_index, ivf_topk

    emb = tables["embeddings"]
    dim = len(emb.select("embedding").first()[0])
    indexed, centroids = ivf_index(emb, dim, n_lists=8)
    assert len(centroids) == 8
    pdf = emb.limit(1).toPandas()
    q = list(pdf["embedding"].iloc[0])
    out = ivf_topk(indexed, centroids, q, k=3, n_probe=2).collect()
    # the query vector's own list is always probed first -> self is top-1
    assert out[0].vec_id == int(pdf["vec_id"].iloc[0])
    assert out[0].cosine > 0.999999
    # recall vs exact: top-1 of brute force must appear when probing all lists
    full = ivf_topk(indexed, centroids, q, k=3, n_probe=8).collect()
    exact = cosine_topk(emb, q, k=3).collect()
    assert [r.vec_id for r in full] == [r.vec_id for r in exact]


def test_cosine_topk_multi_planted_truth(spark):
    """Multi-query sweep (r13 VERDICT task 4): 16 planted clusters
    along near-orthogonal directions, anchors crafted to be the 16
    lexicographically-smallest vectors (so semantic_seeds picks
    exactly them), tight members around each direction. Every query's
    exact top-k lives entirely in its own probed list, so the
    deterministic-IVF sweep must hit recall 1.0 on every query — and
    the result must be layout-independent (repartition invariant)."""
    import pytest
    from pyspark.sql import functions as F

    from sclera_spark.llm import (
        cosine_topk_multi,
        semantic_seeds,
        topk_per_query,
    )
    from sclera_spark.llm.similarity import _dot, _norm, ivf_assign

    # dim 17: coordinate 0 is a pure SORT-KEY coordinate (anchors get a
    # distinct small negative value there, members small non-negative
    # noise) so the 16 anchors are exactly the lexicographically
    # smallest distinct vectors; coordinates 1..16 carry the 16
    # near-orthogonal cluster directions
    dim = 17
    rows = []
    vid = 0
    for c in range(16):
        a = [0.0] * dim
        a[c + 1] = 10.0
        a[0] = -0.001 * (c + 1)
        rows.append((vid, a))
        vid += 1
        for m in range(10):
            v = [0.0001 * ((m + j) % 3) for j in range(dim)]
            v[c + 1] = 10.0 + 0.01 * m
            rows.append((vid, v))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    ).repartition(7)
    seeds = semantic_seeds(emb, 16, "embedding")
    # the planted anchors ARE the seeds (lexicographic smallest)
    anchor_firsts = sorted(r[1][0] for i, r in enumerate(rows) if i % 11 == 0)
    assert sorted(s[0] for s in seeds) == pytest.approx(anchor_firsts)

    queries = []
    for c in range(8):
        qv = [0.0] * dim
        qv[c + 1] = 1.0
        queries.append((c, qv))
    exact = cosine_topk_multi(emb, queries, k=5)
    got = {
        (r.query_id, r.vec_id) for r in exact.collect()
    }
    assert len(got) == 40  # 5 per query
    # brute-force python truth for the exact side
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    for qid, qv in queries:
        want = sorted(
            rows, key=lambda r: (-cos(r[1], qv), r[0])
        )[:5]
        assert {(qid, r[0]) for r in want} == {
            g for g in got if g[0] == qid
        }, f"query {qid} exact top-5 mismatch"
    # layout independence: a different partitioning yields the same set
    got2 = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_multi(emb.repartition(3), queries, k=5).collect()
    }
    assert got2 == got

    # ANN sweep with nprobe=1 (own anchor only): recall must be 1.0 —
    # every exact top-5 member is assigned to the query's own list
    asg = ivf_assign(emb, seeds)
    for qid, qv in queries:
        probes = sorted(
            range(len(seeds)),
            key=lambda i: (
                sum((a - b) * (a - b) for a, b in zip(qv, seeds[i])),
                i,
            ),
        )[:1]
        cand = asg.where(F.col("ivf_list").isin(probes))
        v = F.col("embedding").cast("array<double>")
        qcol = F.array(*[F.lit(float(x)) for x in qv])
        scored = cand.select(
            F.lit(qid).alias("query_id"),
            "vec_id",
            (_dot(v, qcol) / (_norm(v) * F.lit(1.0))).alias("cosine"),
        )
        ann_ids = {
            r.vec_id for r in topk_per_query(scored, 5).collect()
        }
        exact_ids = {g[1] for g in got if g[0] == qid}
        assert ann_ids == exact_ids, f"query {qid} recall < 1.0"


def test_embedding_dup_pairs(spark):
    from sclera_spark.llm import embedding_dup_pairs

    base = [0.1 * i for i in range(8)]
    rows = [
        (1, base),
        (2, [x * 1.0001 for x in base]),        # near-identical direction
        (3, [1.0, -1.0, 0.5, -0.5, 0.2, -0.2, 0.1, -0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_dup_pairs(df, threshold=0.999, n_bits=4, dim=8).collect()
    got = {(r.a_id, r.b_id) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_token_count(tables, duck):
    out = token_count(tables["documents"]).select("doc_id", "n_tokens")
    oracle = """
    SELECT doc_id, length(list_filter(string_split_regex(
        regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
        x -> x <> '')) AS n_tokens
    FROM documents
    """
    assert_df_equal_duck(out, duck, oracle)


def test_quality_scores(tables, duck):
    out = quality_scores(tables["documents"]).select(
        "doc_id", "n_chars_q", "punct_ratio", "digit_ratio"
    )
    oracle = """
    SELECT doc_id,
           length(text) AS n_chars_q,
           length(regexp_replace(text, '[\\w\\s]', '', 'g')) /
               greatest(length(text), 1) AS punct_ratio,
           length(regexp_replace(text, '[^0-9]', '', 'g')) /
               greatest(length(text), 1) AS digit_ratio
    FROM documents
    """
    assert_df_equal_duck(out, duck, oracle)


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy with the sun"),
            (2, "der hund ist nicht in der stadt und das ist gut"),
            (3, "le chat est dans la maison et il est content pour les vacances"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_doc_fingerprint(spark):
    df = spark.createDataFrame(
        [
            (1, "same   text with  odd whitespace"),
            (2, "same text with odd whitespace"),
            (3, "something else entirely here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.fingerprint, r.fingerprint_min_kgram) for r in doc_fingerprint(df).collect()}
    assert rows[1][0] == rows[2][0]  # whitespace-normalized hash equal
    assert rows[1][0] != rows[3][0]


def test_multimodal_plumbing(spark):
    assets = synthetic_assets(spark, 30)
    imgs = image_features(assets).collect()
    assert len(imgs) == 10  # every third asset is an image
    assert all(len(r.feature_vec) <= 8 and r.mean_intensity is not None for r in imgs)
    # determinism: same input -> same features
    again = image_features(assets).collect()
    assert {(r.asset_id, r.mean_intensity) for r in imgs} == {
        (r.asset_id, r.mean_intensity) for r in again
    }
    aud = audio_features(assets).collect()
    assert len(aud) == 10
    assert all(0 <= r.zero_crossing_rate <= 1 for r in aud)
    fr = frame_sample(assets, every_ms=1000)
    n_video = assets.filter(F.col("media_type") == "video").count()
    assert fr.count() >= n_video


def test_media_probe_headers(spark):
    """Header-only decoders parse REAL container bytes: generated
    PNG/JPEG/GIF/BMP/WAV fixtures with known dimensions round-trip
    exactly through probe_media / media_probe."""
    from sclera_spark.llm.multimodal import (
        bmp_bytes,
        gif_bytes,
        jpeg_bytes,
        media_probe,
        png_bytes,
        probe_media,
        synthetic_real_assets,
        wav_bytes,
    )

    # direct parser ground truth
    assert probe_media(png_bytes(640, 480))[:3] == ("png", 640, 480)
    assert probe_media(jpeg_bytes(1920, 1080))[:3] == ("jpeg", 1920, 1080)
    assert probe_media(gif_bytes(13, 7))[:3] == ("gif", 13, 7)
    assert probe_media(bmp_bytes(31, 17))[:3] == ("bmp", 31, 17)
    fmt, _, _, rate, ch, dur = probe_media(wav_bytes(16000, 2, 1500))
    assert (fmt, rate, ch, dur) == ("wav", 16000, 2, 1500)
    # stdlib wave agrees with our RIFF writer+parser
    import io
    import wave

    wf = wave.open(io.BytesIO(wav_bytes(8000, 1, 700)))
    assert (wf.getframerate(), wf.getnchannels()) == (8000, 1)
    assert wf.getnframes() == 8000 * 700 // 1000
    # junk bytes never raise
    assert probe_media(b"\x00" * 64)[0] is None
    assert probe_media(None)[0] is None
    assert probe_media(b"\xff\xd8\xff")[0] is None

    # distributed path: every synthetic asset's parsed metadata matches
    # the arithmetic the generator used
    probed = {r.asset_id: r for r in media_probe(synthetic_real_assets(spark, 50)).collect()}
    assert len(probed) == 50
    for i in range(50):
        r = probed[i]
        if i % 5 == 4:
            assert r.format == "wav"
            assert r.sample_rate == 8000 * (i % 3 + 1)
            assert r.n_channels == i % 2 + 1
            assert r.duration_ms == (i % 10 + 1) * 100
        else:
            assert r.format in ("png", "jpeg", "gif", "bmp")
            assert (r.width, r.height) == (i % 16 + 1, i % 9 + 1)
            assert abs(r.aspect_ratio - r.width / r.height) < 1e-6


def test_ivf_persisted_index_partition_pruning(spark, tables):
    import tempfile

    from pyspark.sql import functions as F

    from sclera_spark.llm import ivf_index, ivf_load, ivf_topk, ivf_topk_indexed, ivf_write

    emb = tables["embeddings"]
    dim = len(emb.select("embedding").first()[0])
    indexed, centroids = ivf_index(emb, dim, n_lists=4)
    path = tempfile.mkdtemp(prefix="sclera_ivf_") + "/idx"
    ivf_write(indexed, centroids, path)

    q = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    got = ivf_topk_indexed(spark, path, q, k=5, n_probe=2).toPandas()
    want = ivf_topk(indexed, centroids, q, k=5, n_probe=2).toPandas()
    assert got["vec_id"].tolist() == want["vec_id"].tolist()

    # the probed-list filter must reach the scan as PARTITION pruning,
    # not a post-scan filter — only n_probe of n_lists directories read
    loaded, cents = ivf_load(spark, path)
    import numpy as np

    qa = np.asarray(q)
    dists = [float(np.linalg.norm(qa - np.asarray(c))) for c in cents]
    probe = sorted(range(len(cents)), key=lambda i: dists[i])[:2]
    plan = (
        loaded.filter(F.col("ivf_list").isin(probe))
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:160]
    assert "ivf_list" in seg


def test_ann_multiprobe_improves_recall(tables):
    import numpy as np

    emb = tables["embeddings"]
    pdf = emb.toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()

    def exact_topk(q, k):
        sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        order = np.lexsort((ids, -sims))
        return set(ids[order[:k]].tolist())

    hits1 = hitsN = denom = 0
    for vid in ids[:5]:
        q = list(mat[np.flatnonzero(ids == vid)[0]])
        want = exact_topk(np.asarray(q), 5)
        got1 = {r.vec_id for r in ann_topk(emb, q, k=5, n_bits=6).collect()}
        gotN = {r.vec_id for r in ann_topk(emb, q, k=5, n_bits=6, n_probe=16).collect()}
        hits1 += len(want & got1)
        hitsN += len(want & gotN)
        denom += len(want)
    assert hitsN > hits1  # probing flipped-margin buckets buys recall
    # the synthetic corpus has no true near neighbors (max cosine ~0.5),
    # so even exact-ish recall saturates slowly; 16 of 64 buckets
    # measured 0.68 on this fixed seed/data
    assert hitsN / denom >= 0.6


def test_pii_redact_duck_parity(spark, duck):
    """pii_redact entry vs its DuckDB oracle (driver t2 mirror): the
    patterns live in the Java-regex/RE2 common subset, so results match
    exactly on planted emails/IPs/SSNs/phone numbers."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    sdf = entry.queries()["pii_redact"](spark, SF_DIR)
    assert_df_equal_duck(sdf, duck, entry.oracle_sql()["pii_redact"])


def test_pii_redact_shapes(spark):
    from sclera_spark.llm.text import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-1.org now"),
            (2, "call (212) 555-0187 or +1 646.555.0123"),
            (3, "host 192.168.0.1 ssn 078-05-1120"),
            (4, "clean text with no pii at all"),
        ],
        "id int, t string",
    )
    got = {r["id"]: r["red"] for r in pii_redact(df, "t", "red").collect()}
    assert got[1] == "mail [EMAIL] now"
    assert got[2] == "call [PHONE] or [PHONE]"
    assert got[3] == "host [IP] ssn [SSN]"
    assert got[4] == "clean text with no pii at all"


def test_doc_repetition_duck_parity(spark, duck):
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    sdf = entry.queries()["doc_repetition"](spark, SF_DIR)
    assert_df_equal_duck(sdf, duck, entry.oracle_sql()["doc_repetition"])


def test_repetition_scores_known_values(spark):
    from sclera_spark.llm.text import repetition_scores

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),      # bigrams: ab ba ab ba -> 2 distinct, top=2
            (2, "x y z w"),        # 3 bigrams, all distinct
            (3, "q q q q"),        # bigrams: qq qq qq -> top=3
        ],
        "id int, t string",
    )
    rows = {r["id"]: r for r in repetition_scores(df, "t", n=2).collect()}
    assert rows[1]["n_ngrams"] == 4 and rows[1]["dup_ngram_frac"] == 0.5
    assert rows[1]["top_ngram_frac"] == 0.5
    assert rows[2]["dup_ngram_frac"] == 0.0
    assert abs(rows[2]["top_ngram_frac"] - 1 / 3) < 1e-12
    assert rows[3]["n_ngrams"] == 3 and rows[3]["top_ngram_frac"] == 1.0


def test_ngram_contamination_duck_parity(spark, duck):
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    sdf = entry.queries()["ngram_contamination"](spark, SF_DIR)
    assert_df_equal_duck(sdf, duck, entry.oracle_sql()["ngram_contamination"])


def test_ngram_contamination_planted(spark):
    from sclera_spark.llm.text import ngram_contamination

    bench = spark.createDataFrame([(100, "the quick brown fox jumps")], "doc_id int, text string")
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),  # shares benchmark trigrams
            (2, "completely different words here now"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_contamination(corpus, bench, n=3).collect()}
    # doc 1: trigrams {the quick brown, quick brown fox, brown fox jumps,
    # fox jumps high}; first three are in the benchmark
    assert rows[1]["n_contaminated"] == 3 and rows[1]["n_grams_distinct"] == 4
    assert abs(rows[1]["contamination_ratio"] - 0.75) < 1e-12
    assert rows[2]["n_contaminated"] == 0 and rows[2]["contamination_ratio"] == 0.0


def test_language_id_duck_parity(spark, duck):
    """The stopword-vote argmax is deterministic list algebra; DuckDB's
    struct list_max tie-breaks on (score, lang) exactly like Spark's
    array_max, and the oracle is generated from the same stopword dict."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    sdf = entry.queries()["language_id"](spark, SF_DIR)
    assert_df_equal_duck(sdf, duck, entry.oracle_sql()["language_id"])


def test_multimodal_features_duck_parity(spark, duck):
    """The fixture's metadata is a pure function of asset_id, so the
    DuckDB oracle recomputes it arithmetically — hash equality is an
    end-to-end proof that the real PNG/JPEG/GIF/BMP/WAV header writers
    and the header-only parsers round-trip every field."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    sdf = entry.queries()["multimodal_features"](spark, SF_DIR)
    assert_df_equal_duck(sdf, duck, entry.oracle_sql()["multimodal_features"])


def test_documents_corpus_is_ascii(spark):
    """The minhash_pairs DuckDB oracle replicates the sketch's BYTE
    5-grams with substr() char 5-grams — valid only while the corpus is
    pure ASCII (utf-8 bytes == chars). Guard that assumption."""
    from tests.conftest import SF_DIR

    from sclera_spark.engine import ScleraEngine

    eng = ScleraEngine(spark)
    eng.add_location(SF_DIR)
    n = (
        eng.table("documents")
        .filter(F.col("text").rlike(r"[^\x00-\x7F]"))
        .count()
    )
    assert n == 0


def test_minhash_pairs_duck_parity(spark, duck):
    """minhash_pairs entry vs the exact all-pairs 5-gram-Jaccard oracle:
    LSH candidates + exact verify must equal ground truth (100% recall on
    this corpus — every true pair sits far above the banding threshold)."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    sdf = entry.queries()["minhash_pairs"](spark, SF_DIR)
    assert_df_equal_duck(sdf, duck, entry.oracle_sql()["minhash_pairs"])


def test_hash_sample_layout_independent(spark):
    """The sample must not depend on physical partitioning — same ids at
    any repartitioning, and stable across reruns."""
    from sclera_spark.llm import hash_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_sample(df.repartition(7), 0.3, "doc_id").collect()}
    b = {r.doc_id for r in hash_sample(df.repartition(3), 0.3, "doc_id").collect()}
    assert a == b
    assert 0.2 < len(a) / 2000 < 0.4
    # a different salt draws an (essentially) independent sample
    c = {r.doc_id for r in hash_sample(df, 0.3, "doc_id", salt="v").collect()}
    assert c != a


def test_stratified_sample_exact_quota(spark):
    from sclera_spark.llm import stratified_sample

    df = spark.createDataFrame(
        [("a", i) for i in range(20)] + [("b", 100 + i) for i in range(3)],
        "g string, id int",
    )
    out = stratified_sample(df, "g", 5, "id").groupBy("g").count().collect()
    quotas = {r.g: r["count"] for r in out}
    assert quotas == {"a": 5, "b": 3}
    # deterministic: same rows again
    r1 = sorted(r.id for r in stratified_sample(df, "g", 5, "id").collect())
    r2 = sorted(r.id for r in stratified_sample(df, "g", 5, "id").collect())
    assert r1 == r2


def test_text_normalize_known_values(spark):
    from sclera_spark.llm import text_normalize

    df = spark.createDataFrame(
        [(1, "  Hello\t\tWORLD\x07\x01\n\n  x  ")], "id int, text string"
    )
    out = text_normalize(df).collect()[0].text_norm
    assert out == "hello world x"


def test_url_extract_known_values(spark):
    from sclera_spark.llm import url_extract

    df = spark.createDataFrame(
        [(1, "go to https://a.example.org/p/1 or http://b.net end")],
        "doc_id int, text string",
    )
    rows = sorted((r.url, r.domain) for r in url_extract(df).collect())
    assert rows == [
        ("http://b.net", "b.net"),
        ("https://a.example.org/p/1", "a.example.org"),
    ]


def test_sampling_and_text_entries_duck_parity(spark, duck):
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    for name in ("hash_sample", "stratified_sample", "text_normalize", "url_extract"):
        sdf = entry.queries()[name](spark, SF_DIR)
        assert_df_equal_duck(sdf, duck, entry.oracle_sql()[name])


# ------------------------------------------------- real pixel/sample decode


def test_png_roundtrip_all_supported_shapes():
    from sclera_spark.llm.multimodal import decode_png, png_bytes_with_pixels

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(5, 7, ch), dtype=np.uint8)
        for ft in (0, 2):
            out = decode_png(png_bytes_with_pixels(px, filter_type=ft))
            assert out.shape == (5, 7, ch)
            assert (out == px).all(), f"ch={ch} filter={ft}"


def test_png_decode_sub_average_paeth_filters():
    """Hand-filtered scanlines for the sequential filters (1=Sub, 3=Avg,
    4=Paeth) against the spec's reconstruction functions."""
    import struct
    import zlib

    from sclera_spark.llm.multimodal import decode_png

    px = np.array([[10, 20, 30, 40], [15, 25, 35, 45]], dtype=np.uint8)
    h, w = px.shape
    # filter 1 (Sub) on row 0, filter 3 (Average) on row 1
    r0 = np.diff(px[0], prepend=0).astype(np.uint8)
    r1 = np.empty(w, np.uint8)
    cur = px[1]
    for i in range(w):
        a = int(cur[i - 1]) if i else 0
        r1[i] = (int(cur[i]) - ((a + int(px[0][i])) >> 1)) & 0xFF
    raw = b"\x01" + r0.tobytes() + b"\x03" + r1.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(
            ">I", zlib.crc32(tag + data)
        )

    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    assert (decode_png(png)[..., 0] == px).all()
    # filter 4 (Paeth): predictor of row 1 given row 0
    r1p = np.empty(w, np.uint8)
    for i in range(w):
        a = int(cur[i - 1]) if i else 0
        b = int(px[0][i])
        c = int(px[0][i - 1]) if i else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        r1p[i] = (int(cur[i]) - pred) & 0xFF
    raw = b"\x01" + r0.tobytes() + b"\x04" + r1p.tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    assert (decode_png(png)[..., 0] == px).all()


def test_ppm_roundtrip_and_comments():
    from sclera_spark.llm.multimodal import decode_ppm, ppm_bytes

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    assert (decode_ppm(ppm_bytes(gray))[..., 0] == gray).all()
    rgb = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    assert (decode_ppm(ppm_bytes(rgb)) == rgb).all()
    # header comments are legal netpbm
    with_comment = b"P5\n# a comment\n6 4\n255\n" + gray.tobytes()
    assert (decode_ppm(with_comment)[..., 0] == gray).all()


def test_wav_pcm_decode_sine_ground_truth():
    from sclera_spark.llm.multimodal import decode_wav, wav_bytes

    pcm, rate = decode_wav(wav_bytes(8000, 1, 500, tone_hz=440.0))
    assert rate == 8000 and pcm.shape == (4000, 1)
    rms = float(np.sqrt((pcm.astype(np.float64) ** 2).mean()))
    # full-scale/2 sine: rms = 0.5/sqrt(2) (PCM quantization ~1e-4)
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3


def test_image_pixel_features_real_path(spark):
    from sclera_spark.llm.multimodal import image_pixel_features, synthetic_pixel_assets

    feats = image_pixel_features(synthetic_pixel_assets(spark, 40)).collect()
    by_id = {r.asset_id: r for r in feats}
    assert all(r.decoded_real == 1 for r in feats)  # PNG/PPM decode for real
    # kind 2 rotates: constant-RGB PNG (gray mean 20), constant-gray
    # JPEG (REAL entropy decode, mean 40), constant gray-neutral COLOR
    # JPEG (3-component scan + YCbCr, bit-exact, mean 60); all std 0
    for i in range(2, 40, 4):
        want = {0: 20.0, 1: 40.0, 2: 60.0, 3: 40.0}[(i // 4) % 4]
        assert abs(by_id[i].mean_intensity - want) < 1e-6
        assert by_id[i].std_intensity == 0.0
        assert by_id[i].width == i % 16 + 1 and by_id[i].height == i % 9 + 1


def test_audio_pcm_features_real_path(spark):
    from sclera_spark.llm.multimodal import audio_pcm_features, synthetic_pixel_assets

    feats = audio_pcm_features(synthetic_pixel_assets(spark, 40)).collect()
    assert feats and all(r.decoded_real == 1 for r in feats)
    for r in feats:
        assert r.sample_rate == 8000
        assert r.duration_ms == (r.asset_id % 5 + 1) * 100
        assert abs(r.rms - 0.5 / np.sqrt(2)) < 1e-3


def test_duplicated_spans_duck_parity(spark, duck):
    """The Spark fp-seeded span report equals the gram-string DuckDB
    recomputation exactly — certifying both the diagonal merge and the
    absence of xxhash64 collisions on this corpus."""
    from sclera_spark.llm import duplicated_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = duplicated_spans(docs.select("doc_id", "text"), k=8)
    oracle = r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(regexp_replace(
                 text, '[^a-z0-9\s]', ' ', 'g')), '\s+'), x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, i AS pos, array_to_string(t[i:i+7], chr(31)) AS g
      FROM toks, unnest(range(1, len(t) - 8 + 2)) AS u(i)
      WHERE len(t) >= 8
    ), elig AS (
      SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND 1000
    ), seeds AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a, b.pos AS pos_b
      FROM (SELECT * FROM grams WHERE g IN (SELECT g FROM elig)) a
      JOIN (SELECT * FROM grams WHERE g IN (SELECT g FROM elig)) b
        ON a.g = b.g AND a.doc_id < b.doc_id
    ), isl AS (
      SELECT id_a, id_b, pos_a, pos_b,
             pos_a - row_number() OVER (
                 PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a) AS grp
      FROM seeds
    )
    SELECT id_a, id_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
           CAST(max(pos_a) - min(pos_a) + 8 AS BIGINT) AS span_len
    FROM isl GROUP BY id_a, id_b, pos_a - pos_b, grp
    """
    assert_df_equal_duck(out, duck, oracle)
    assert out.count() > 0  # planted near-dups make this non-vacuous


def test_duplicated_spans_planted(spark):
    """Two docs sharing one known 20-token run -> exactly one maximal
    span with exact offsets; a doc with no overlap contributes nothing."""
    from sclera_spark.llm import duplicated_spans, span_dedup_mask

    shared = " ".join(f"tok{i}" for i in range(20))
    rows = [
        (1, "alpha beta " + shared + " gamma delta"),
        (2, "one two three four five " + shared),
        (3, "completely different words " + " ".join(f"z{i}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicated_spans(docs, k=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.span_len == 20
    assert r.start_a == 3  # after "alpha beta"
    assert r.start_b == 6  # after five leading words
    # survivor mask drops the higher id of the pair
    spans = duplicated_spans(docs, k=8)
    kept = span_dedup_mask(spans, docs, min_span=20)
    assert sorted(x.doc_id for x in kept.collect()) == [1, 3]
    # a stricter threshold keeps everything
    kept_all = span_dedup_mask(spans, docs, min_span=21)
    assert kept_all.count() == 3


def test_duplicated_spans_gram_freq_cap(spark):
    """A gram above max_gram_freq is boilerplate: with the cap at its
    occurrence count the span appears, one lower it is suppressed."""
    from sclera_spark.llm import duplicated_spans

    boiler = " ".join(f"b{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(i, f"head{i} " + boiler + f" tail{i}") for i in range(5)],
        ["doc_id", "text"],
    )
    # the 8-gram "b0..b7" occurs 5 times -> 10 pairs with cap >= 5
    assert duplicated_spans(docs, k=8, max_gram_freq=5).count() == 10
    assert duplicated_spans(docs, k=8, max_gram_freq=4).count() == 0


def test_vocab_stats_duck_parity(spark, duck):
    from sclera_spark.llm import vocab_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = vocab_stats(docs.select("doc_id", "text"), top_n=50)
    oracle = r"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(
                 regexp_replace(text, '[^a-z0-9\s]', ' ', 'g')), '\s+'),
                 x -> x <> '')) AS token
      FROM documents
    )
    SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
    FROM toks GROUP BY token ORDER BY tf DESC, token ASC LIMIT 50
    """
    assert_df_equal_duck(out, duck, oracle)


def test_weighted_sample_quota_layout_and_eligibility(spark):
    from sclera_spark.llm import weighted_sample

    rows = [(i, "g%d" % (i % 3), float(i % 7) - 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "k int, g string, w double")
    out = weighted_sample(df, "w", 5, "k", group_col="g", salt="s")
    pdf = out.toPandas()
    # exact quota per stratum; only positive weights eligible
    assert pdf.groupby("g").size().tolist() == [5, 5, 5]
    assert (pdf.w > 0).all()
    # layout-independent: a different physical partitioning draws the
    # same sample
    out2 = weighted_sample(df.repartition(13, "w"), "w", 5, "k", group_col="g", salt="s")
    assert set(map(tuple, pdf[["k"]].values.tolist())) == {
        (r.k,) for r in out2.collect()
    }
    # weights bias inclusion: across many salts, a weight-7 row must be
    # drawn more often than a weight-1 row (single global stratum)
    heavy = spark.createDataFrame(
        [(1, 10.0), (2, 0.1)], "k int, w double"
    )
    import warnings

    wins = {1: 0, 2: 0}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for s in range(12):
            top = weighted_sample(heavy, "w", 1, "k", salt=str(s)).collect()[0]
            wins[top.k] += 1
    assert wins[1] > wins[2]


def test_ivf_append_maintains_index(spark, tables):
    """Index maintenance: ivf_append assigns against the frozen sidecar
    centroids (JVM-side argmin — parity with MLlib's assignment checked
    exactly) and appends into the partition layout, so probes see the
    new vectors with pruning intact and nothing existing rewritten."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from sclera_spark.llm import ivf_index, ivf_load, ivf_write
    from sclera_spark.llm.similarity import ivf_append, ivf_assign, ivf_topk_indexed

    emb = tables["embeddings"]
    dim = len(emb.select("embedding").first()[0])
    old = emb.filter("vec_id % 5 > 0")
    new = emb.filter("vec_id % 5 = 0")
    indexed, centroids = ivf_index(old, dim, n_lists=4)

    # assignment parity: the JVM-side argmin reproduces MLlib's
    # assignments for every already-indexed vector
    ours = {
        r.vec_id: r.ivf_list
        for r in ivf_assign(old, centroids).select("vec_id", "ivf_list").collect()
    }
    theirs = {
        r.vec_id: r.ivf_list
        for r in indexed.select("vec_id", "ivf_list").collect()
    }
    assert ours == theirs

    path = tempfile.mkdtemp(prefix="sclera_ivf_app_") + "/idx"
    ivf_write(indexed, centroids, path)
    files_before = {
        os.path.join(dp, f)
        for dp, _dn, fns in os.walk(path)
        for f in fns
        if f.endswith(".parquet")
    }
    n = ivf_append(spark, path, new)
    assert n == new.count()
    # nothing existing rewritten — append-only at the file level
    files_after = {
        os.path.join(dp, f)
        for dp, _dn, fns in os.walk(path)
        for f in fns
        if f.endswith(".parquet")
    }
    assert files_before <= files_after and len(files_after) > len(files_before)

    loaded, _cents = ivf_load(spark, path)
    assert loaded.count() == emb.count()

    # an appended vector is findable: probing its own list returns it as
    # top-1 with cosine ~1
    qrow = new.orderBy("vec_id").first()
    q = [float(x) for x in qrow["embedding"]]
    got = ivf_topk_indexed(spark, path, q, k=3, n_probe=2).collect()
    assert got[0].vec_id == qrow["vec_id"]
    assert got[0].cosine > 0.999999


def test_gif_roundtrip_and_dispatch():
    """GIF-LZW decode (decode_gif): exact pixel recovery from the
    literal-code encoder, dictionary-growth path via a zlib-style
    pathological input, and router dispatch with decoded_real=1."""
    from sclera_spark.llm.multimodal import (
        decode_gif,
        decode_pixels,
        gif_bytes,
        gif_pixel_bytes,
    )

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (3, 5), (9, 16), (31, 47)]:
        px = rng.integers(0, 256, (h, w)).astype(np.uint8)
        out = decode_gif(gif_pixel_bytes(px))
        assert out.shape == (h, w, 3)
        assert (out == px[..., None]).all()
    # router: real path for pixel GIFs, honest fallback for header-only
    arr, real = decode_pixels(gif_pixel_bytes(np.full((4, 6), 77, np.uint8)))
    assert real and (arr == 77).all()
    arr, real = decode_pixels(gif_bytes(4, 4))
    assert arr is None and not real


def test_gif_lzw_dictionary_growth():
    """An input with long repeated runs forces the decoder's dictionary
    past the initial width (table-append + KwKwK case). Cross-check
    against an independent reference: encode with the same literal
    scheme but min_code=2 over a 4-color image, where width grows from
    3 bits immediately."""
    from sclera_spark.llm.multimodal import _lzw_decode

    # hand-build a min_code=2 stream: CLEAR(100b) 0 1 EOI over 3-bit codes
    # bits LSB-first: 100 000 001 101 -> bytes
    vals = [0b100, 0b000, 0b001, 0b101]
    acc = nbits = 0
    data = bytearray()
    for v in vals:
        acc |= v << nbits
        nbits += 3
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    assert _lzw_decode(bytes(data), 2, 10) == [0, 1]

    # KwKwK: CLEAR 1 <code 6 = prev+prev[0]> EOI; table after '1' has
    # codes 0-5 (4 literals + clear/eoi), so 6 is the just-about-to-be-
    # defined code -> entry must be [1, 1]
    vals = [0b100, 0b001, 0b110, 0b101]
    acc = nbits = 0
    data = bytearray()
    for v in vals:
        acc |= v << nbits
        nbits += 3
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    assert _lzw_decode(bytes(data), 2, 10) == [1, 1, 1]


def test_chunk_documents_semantics(spark):
    """Token-window chunking: grid coverage (every token in >=1 chunk),
    overlap equality between consecutive chunks, short-doc single chunk,
    empty doc -> no chunks."""
    from sclera_spark.llm import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks: chunks at 0,3,6,9
        (2, "a b"),                                  # single short chunk
        (3, "   "),                                  # empty -> none
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc
    assert [r.chunk_text for r in sorted(by_doc[2], key=lambda r: r.chunk_id)] == ["a b"]
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.start_token for r in c1] == [0, 3, 6, 9]
    assert [r.n_tokens for r in c1] == [4, 4, 4, 1]
    # overlap: last token of chunk k == first token of chunk k+1
    for a, b in zip(c1, c1[1:]):
        assert a.chunk_text.split()[-1] == b.chunk_text.split()[0]
    # coverage: union of chunk tokens == all tokens
    seen = set()
    for r in c1:
        seen.update(r.chunk_text.split())
    assert seen == {f"t{i}" for i in range(10)}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_jpeg_roundtrip_gray_and_color():
    """Baseline JPEG codec (llm/jpeg.py): constant blocks bit-exact
    (lone DC coefficient), smooth images tight under the flat q=8 table,
    color via JFIF YCbCr at 4:4:4 and 4:2:0; router dispatch with
    decoded_real=1; header-only fixture falls back honestly."""
    from sclera_spark.llm.jpeg import decode_jpeg, encode_jpeg_gray, encode_jpeg_rgb
    from sclera_spark.llm.multimodal import decode_pixels, jpeg_bytes

    rng = np.random.default_rng(17)
    # constant-block exactness at awkward (non multiple-of-8) sizes
    for h, w in [(1, 1), (5, 7), (16, 24), (17, 33)]:
        bh, bw = (h + 7) // 8, (w + 7) // 8
        blocks = rng.integers(0, 256, (bh, bw)).astype(np.uint8)
        px = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:h, :w]
        out = decode_jpeg(encode_jpeg_gray(px))
        assert out.shape == (h, w, 1)
        assert (out[:, :, 0] == px).all()
    # noisy gray: bounded loss
    px = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_gray(px))[:, :, 0]
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 40
    # color, both subsamplings
    yy, xx = np.mgrid[0:21, 0:37]
    rgb = np.stack(
        [(xx * 5 % 256), (yy * 7 % 256), ((xx + yy) * 3 % 256)], axis=2
    ).astype(np.uint8)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg_rgb(rgb, subsample=sub))
        assert out.shape == (21, 37, 3)
        err = np.abs(out.astype(int) - rgb.astype(int)).max()
        assert err <= (12 if sub else 6), (sub, err)
    # router: real decode flag; header-only JPEG (no scan) -> fallback
    arr, real = decode_pixels(encode_jpeg_gray(np.full((6, 6), 99, np.uint8)))
    assert real and (arr[:, :, 0] == 99).all()
    arr, real = decode_pixels(jpeg_bytes(4, 4))
    assert arr is None and not real


def test_bmp_roundtrip():
    """24-bit uncompressed BMP: exact round trip (bottom-up rows, stride
    padding, BGR order) + router dispatch."""
    from sclera_spark.llm.multimodal import bmp_pixel_bytes, decode_bmp, decode_pixels

    rng = np.random.default_rng(23)
    for h, w in [(1, 1), (3, 5), (9, 13)]:  # odd widths exercise padding
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        out = decode_bmp(bmp_pixel_bytes(px))
        assert out.shape == (h, w, 3)
        assert (out == px).all()
    arr, real = decode_pixels(bmp_pixel_bytes(np.full((4, 6, 3), 55, np.uint8)))
    assert real and (arr == 55).all()


def test_pack_documents_layout_independent(spark, tables):
    """Sequence packing: spans tile the concatenated token stream
    exactly (every pack holds max_len tokens except the last; per-doc
    spans are contiguous and sum to the doc's tokens), and the result
    is IDENTICAL under repartitioning and bucket-count changes — the
    two-phase prefix sum is layout-independent."""
    from sclera_spark.llm import pack_documents, token_count

    docs = tables["documents"]
    out = pack_documents(docs, max_len=512).collect()
    rows = sorted((r.doc_id, r.pack_id, r.tok_start, r.tok_end) for r in out)

    # per-doc: spans contiguous from 0 to n_tokens
    from collections import defaultdict

    spans = defaultdict(list)
    for d, p, s, e in rows:
        assert 0 <= s < e
        spans[d].append((p, s, e))
    n_tok = {
        r.doc_id: r.n_tokens
        for r in token_count(docs).select("doc_id", "n_tokens").collect()
    }
    for d, sp in spans.items():
        sp.sort()
        assert sp[0][1] == 0 and sp[-1][2] == n_tok[d]
        for (p0, _, e0), (p1, s1, _) in zip(sp, sp[1:]):
            assert p1 == p0 + 1 and s1 == e0  # contiguous, pack-adjacent
    # per-pack: sizes are exactly max_len except the final pack
    pack_sz = defaultdict(int)
    for _, p, s, e in rows:
        pack_sz[p] += e - s
    last = max(pack_sz)
    assert set(pack_sz) == set(range(last + 1))  # no holes
    for p, sz in pack_sz.items():
        assert sz == 512 or (p == last and 0 < sz <= 512)

    # layout independence: different partitioning + bucket count
    shuffled = docs.repartition(17)
    again = sorted(
        (r.doc_id, r.pack_id, r.tok_start, r.tok_end)
        for r in pack_documents(shuffled, max_len=512, buckets=5).collect()
    )
    assert again == rows

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_len"):
        pack_documents(docs, max_len=0)


def test_minhash_anti_join_crawl_gate(spark, tables):
    """Cross-corpus dedup: planted near-copies of corpus docs are
    rejected from the incoming batch, genuinely-new docs survive, and
    the corpus side is never self-joined (the op returns only incoming
    rows). Non-vacuous by construction: we plant the duplicates."""
    from pyspark.sql import functions as F

    from sclera_spark.llm import minhash_anti_join

    docs = tables["documents"].select("doc_id", "text").where(
        "text IS NOT NULL AND length(text) > 200"
    )
    corpus = docs.where("doc_id % 2 = 0")
    # incoming = planted near-copies of 5 corpus docs (tail tweaked,
    # high jaccard) + genuinely new synthetic docs
    planted = (
        corpus.orderBy("doc_id").limit(5)
        .select(
            (F.col("doc_id") + 1_000_001).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tiny tail tweak")).alias("text"),
        )
    )
    fresh = spark.range(3).selectExpr(
        "id + 2000001 AS doc_id",
        "concat('entirely novel document number ', id, ' with its own ',"
        " repeat('unmistakably unique phrasing ', 20)) AS text",
    )
    incoming = planted.unionByName(fresh)
    kept = minhash_anti_join(
        incoming, corpus, threshold=0.7, num_perm=128, bands=16
    )
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids == [2000001, 2000002, 2000003]
    # original columns come back untouched
    assert set(kept.columns) == {"doc_id", "text"}


def test_mixture_sample_quota_dict(spark, tables):
    """Per-stratum quota dict: each listed stratum fills exactly
    min(quota, |stratum|), unlisted strata vanish, and the sample is
    layout-independent (re-run under repartitioning is identical)."""
    from sclera_spark.llm import stratified_sample

    ev = tables["events"].select("event_type", "event_id")
    quotas = {"view": 7, "click": 3}
    out = stratified_sample(ev, "event_type", quotas, "event_id", salt="t")
    got = out.groupBy("event_type").count().collect()
    sizes = {r.event_type: r["count"] for r in got}
    avail = {
        r.event_type: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    assert sizes == {
        k: min(v, avail.get(k, 0)) for k, v in quotas.items() if avail.get(k)
    }
    again = stratified_sample(
        ev.repartition(13), "event_type", quotas, "event_id", salt="t"
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, out.collect())
    )


def test_pq_planted_truth_recall_and_plan(spark, tables):
    """Product quantization: ADC top-k over 8-int codes finds the
    planted exact-match vector at rank 1 (with refine, by exact
    cosine), codes are layout-independent, and the whole path is
    JVM-side (no Python eval)."""
    from pyspark.sql import functions as F

    from sclera_spark.llm import pq_encode, pq_topk, pq_train

    emb = tables["embeddings"].select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()[0])
    books = pq_train(emb, dim, m=8, n_centers=16, sample_rows=500, seed=7)
    assert len(books) == 8 and len(books[0]) == 16
    enc = pq_encode(emb, books)

    # planted truth: the query IS a corpus vector — ADC+refine must
    # return it first (its ADC distance is the minimum possible for
    # its own code cell; refine makes rank-1 exact)
    probe = emb.orderBy("vec_id").limit(3).collect()
    for r in probe:
        q = [float(x) for x in r["embedding"]]
        top = pq_topk(enc, books, q, k=3, refine=32).collect()
        assert top[0]["vec_id"] == r["vec_id"]
        assert abs(top[0]["cosine"] - 1.0) < 1e-9

    # pure-ADC path returns k rows ordered by adc_dist
    t = pq_topk(enc, books, [float(x) for x in probe[0]["embedding"]], k=5)
    rows = t.collect()
    assert len(rows) == 5
    assert [r["adc_dist"] for r in rows] == sorted(
        r["adc_dist"] for r in rows
    )

    # layout independence of encoding
    enc2 = pq_encode(emb.repartition(13), books)
    a = sorted((r["vec_id"], tuple(r["pq_code"])) for r in enc.collect())
    b = sorted((r["vec_id"], tuple(r["pq_code"])) for r in enc2.collect())
    assert a == b

    # JVM-side plan: no Python eval in encode or ADC scan
    plan = t._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_pq_persisted_index(spark, tables, tmp_path):
    """Composed IVF+PQ: the probe is PARTITION pruning (PartitionFilters
    in the scan, only probed lists' files read), candidates score by
    ADC over codes, exact re-rank recovers the planted truth; the
    vectors-dropped build answers from codes alone."""
    from sclera_spark.llm import ivf_pq_topk, ivf_pq_write

    emb = tables["embeddings"].select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()[0])
    path = str(tmp_path / "ivfpq")
    ivf_pq_write(emb, dim, path, n_lists=8, m=8, n_centers=16, seed=7)

    probe = emb.orderBy("vec_id").limit(2).collect()
    for r in probe:
        q = [float(x) for x in r["embedding"]]
        top = ivf_pq_topk(spark, path, q, k=3, n_probe=2, refine=50)
        rows = top.collect()
        assert rows[0]["vec_id"] == r["vec_id"]
        # partition pruning: the scan carries a non-empty
        # PartitionFilters on ivf_list (inputFiles() lists the whole
        # FileIndex regardless of pruning, so the plan is the gate —
        # same assertion style as the plain-IVF plan-quality test)
        plan = top._jdf.queryExecution().executedPlan().toString()
        assert "ivf_list" in plan.split("PartitionFilters")[1][:120]

    # compact build: vectors dropped, ADC-only answers still rank the
    # planted vector first (its code cell distance is minimal)
    path2 = str(tmp_path / "ivfpq_small")
    ivf_pq_write(
        emb, dim, path2, n_lists=8, seed=7, keep_vectors=False
    )
    q = [float(x) for x in probe[0]["embedding"]]
    rows = ivf_pq_topk(spark, path2, q, k=3, n_probe=2).collect()
    assert rows[0]["vec_id"] == probe[0]["vec_id"]
    assert "adc_dist" in rows[0].asDict()


def test_minhash_anti_join_sketched_incremental_gate(spark, tables, tmp_path):
    """The incremental crawl gate (minhash_anti_join_sketched): gating
    batch 2 against a PERSISTED corpus sketch table — appended with
    batch 1's survivors, never re-sketching the corpus — admits exactly
    the same documents as re-running the full gate from raw text. Also
    pins the num_perm-mismatch refusal (a mismatched persisted sketch
    would silently band garbage)."""
    import pytest
    from pyspark.sql import functions as F

    from sclera_spark.llm import (
        minhash_anti_join,
        minhash_anti_join_sketched,
        minhash_sketch,
    )
    from sclera_spark.sources.manifest import ManifestTable

    docs = tables["documents"].select("doc_id", "text").where(
        "text IS NOT NULL AND length(text) > 200"
    )
    corpus = docs.where("doc_id % 3 = 0")
    batch1 = docs.where("doc_id % 3 = 1")
    batch2_dupe = (
        batch1.orderBy("doc_id").limit(4)
        .select(
            (F.col("doc_id") + 5_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
    )
    batch2 = docs.where("doc_id % 3 = 2").unionByName(batch2_dupe)

    def sk(df):
        return minhash_sketch(df, "text", 128, 5).select(
            F.col("doc_id").alias("id"), "minhash", "hset"
        )

    # persist the corpus sketch as a manifest table (the 100 TB shape:
    # the raw corpus text is never read again)
    path = str(tmp_path / "corpus_sketch")
    mt = ManifestTable.create(sk(corpus), path)

    kept1 = minhash_anti_join_sketched(
        batch1, mt.read(spark), threshold=0.7, num_perm=128, bands=16
    )
    # roll the survivors' sketches into the corpus (incremental append)
    mt.append(sk(kept1))
    kept2 = minhash_anti_join_sketched(
        batch2, mt.read(spark), threshold=0.7, num_perm=128, bands=16
    )

    # oracle: the from-scratch gates over raw text
    ref1 = minhash_anti_join(batch1, corpus, threshold=0.7, num_perm=128, bands=16)
    ref_corpus2 = corpus.unionByName(ref1.select("doc_id", "text"))
    ref2 = minhash_anti_join(batch2, ref_corpus2, threshold=0.7, num_perm=128, bands=16)
    assert sorted(r.doc_id for r in kept1.select("doc_id").collect()) == sorted(
        r.doc_id for r in ref1.select("doc_id").collect()
    )
    got2 = sorted(r.doc_id for r in kept2.select("doc_id").collect())
    assert got2 == sorted(r.doc_id for r in ref2.select("doc_id").collect())
    # the planted batch-1 near-copies were rejected (non-vacuous gate)
    assert not [i for i in got2 if i >= 5_000_000]

    # width mismatch refuses loudly — in the band scan itself (r14:
    # the eager head(1) probe cost a corpus scan per call and checked
    # ONE row; the in-band guard validates every row for free)
    with pytest.raises(Exception, match="num_perm"):
        minhash_anti_join_sketched(
            batch2, mt.read(spark), threshold=0.7, num_perm=64, bands=16
        ).count()
    # a MIXED-width (mis-appended) sketch table also fails loudly,
    # even though its first row has the right width — the case the
    # single-row probe could not catch
    mt.append(sk(corpus.limit(2)).withColumn("minhash", F.slice("minhash", 1, 64)))
    with pytest.raises(Exception, match="num_perm"):
        minhash_anti_join_sketched(
            batch2, mt.read(spark), threshold=0.7, num_perm=128, bands=16
        ).count()


def test_token_budget_sample_semantics(spark, tables):
    """Token-budget draw: the admitted set is exactly the hash-order
    prefix whose EXCLUSIVE token total stays under budget (take-until:
    the last admitted doc may overshoot), NULL text counts 0, the cut
    is layout-independent, and count_col budgets on precomputed
    counts. budget <= 0 refuses."""
    import pytest
    from pyspark.sql import functions as F

    from sclera_spark.llm import token_budget_sample
    from sclera_spark.llm.text import _tokens

    docs = tables["documents"].select("doc_id", "text")
    out = token_budget_sample(docs, budget=7_000, salt="s7")
    got = sorted(r.doc_id for r in out.select("doc_id").collect())

    # reference cut: single-node exclusive prefix over (md5, id) order
    rows = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("s7"), F.col("doc_id").cast("string"))).alias("h"),
        F.coalesce(F.size(_tokens(F.col("text"))).cast("long"), F.lit(0)).alias("n"),
    ).collect()
    rows.sort(key=lambda r: (r.h, r.doc_id))
    want, acc = [], 0
    for r in rows:
        if acc < 7_000:
            want.append(r.doc_id)
        acc += r.n
    assert got == sorted(want)
    # the budget genuinely cuts (non-vacuous) and overshoot is bounded
    # by one document
    assert 0 < len(got) < docs.count()
    tot = (
        docs.join(out.select("doc_id"), "doc_id")
        .select(F.coalesce(F.size(_tokens(F.col("text"))), F.lit(0)).alias("n"))
        .agg(F.sum("n")).first()[0]
    )
    max_doc = docs.select(
        F.max(F.coalesce(F.size(_tokens(F.col("text"))), F.lit(0)))
    ).first()[0]
    assert tot >= 7_000 or len(got) == docs.count()
    assert tot < 7_000 + max_doc

    # layout independence: same cut under aggressive repartitioning
    again = token_budget_sample(docs.repartition(17), budget=7_000, salt="s7")
    assert sorted(r.doc_id for r in again.select("doc_id").collect()) == got

    # count_col path: budget on precomputed counts
    pre = docs.withColumn("n_pre", F.lit(100))
    k = token_budget_sample(pre, budget=1_000, salt="s7", count_col="n_pre")
    assert k.count() == 10  # exactly budget/100 docs admitted

    with pytest.raises(ValueError, match="budget"):
        token_budget_sample(docs, budget=0)


def test_quality_classifier_contrast_training(spark, tables, tmp_path):
    """CCNet/fastText-style contrast filter (llm/quality_ml): trained
    to separate real corpus text from a corrupted variant, the model
    must (a) separate a HELD-OUT split near-perfectly, (b) score
    NULL/empty text NULL without dropping rows, (c) round-trip through
    save/load, and (d) refuse an empty training side. Scoring is a
    pure JVM pipeline transform (no Python in the path)."""
    import pytest
    from pyspark.sql import functions as F

    from sclera_spark.llm import (
        load_quality_classifier,
        score_quality_classifier,
        train_quality_classifier,
    )

    docs = tables["documents"].select("doc_id", "text").where(
        "text IS NOT NULL AND length(text) > 100"
    )
    # corrupted variant: strip vowels, inject punctuation runs — the
    # blatant quality contrast a filter must learn
    junk = docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", r"[aeiouAEIOU]", "#"), r"\s", " !! "
        ).alias("text"),
    )
    train_ref = docs.where("doc_id % 2 = 0")
    train_junk = junk.where("doc_id % 2 = 0")
    model = train_quality_classifier(
        train_ref, train_junk, hash_dim=1 << 14, max_iter=20
    )
    held_ref = score_quality_classifier(docs.where("doc_id % 2 = 1"), model)
    held_junk = score_quality_classifier(junk.where("doc_id % 2 = 1"), model)
    n_ref = held_ref.count()
    ref_right = held_ref.where("quality_prob > 0.5").count()
    junk_right = held_junk.where("quality_prob < 0.5").count()
    assert ref_right / n_ref > 0.98
    assert junk_right / held_junk.count() > 0.98

    # NULL/empty text: row kept, score NULL
    odd = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "some genuinely normal text here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.quality_prob for r in score_quality_classifier(odd, model).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] is None and got[2] is None and got[3] is not None

    # persistence round-trip scores identically
    path = str(tmp_path / "qmodel")
    model.save(path)
    re = load_quality_classifier(path)
    a = sorted(
        (r.doc_id, round(r.quality_prob, 9))
        for r in held_ref.collect()
    )
    b = sorted(
        (r.doc_id, round(r.quality_prob, 9))
        for r in score_quality_classifier(
            docs.where("doc_id % 2 = 1"), re
        ).collect()
    )
    assert a == b

    with pytest.raises(ValueError, match="non-empty"):
        train_quality_classifier(docs.limit(0), train_junk)


def test_token_budget_signed_and_null_counts(spark):
    """r13 review pins on the shared prefix sum: a NULL precomputed
    count rides along free (counts 0, row not dropped), and SIGNED
    counts (credits) keep every later range-partition's carry exact —
    the per-partition total must be the SUM, not the cumsum's PEAK."""
    from pyspark.sql import functions as F

    from sclera_spark.llm import token_budget_sample
    from sclera_spark.llm.text import global_prefix_sum

    rows = [(i, None if i % 7 == 0 else 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = token_budget_sample(
        df, budget=200, salt="sn", count_col="n", text_col="doc_id"
    )
    got = sorted(r.doc_id for r in out.collect())
    # single-node reference with NULL->0
    import hashlib

    ref = sorted(
        rows,
        key=lambda r: (
            hashlib.md5(f"sn{r[0]}".encode()).hexdigest(),
            r[0],
        ),
    )
    want, acc = [], 0
    for i, n in ref:
        if acc < 200:
            want.append(i)
        acc += n or 0
    assert got == sorted(want)
    assert any(i % 7 == 0 for i in got)  # NULL rows ride along

    # signed values: global exclusive prefix must match a single
    # window regardless of range partitioning
    vals = [(i, (-50 if i % 3 == 0 else 30)) for i in range(200)]
    sdf = spark.createDataFrame(vals, "k long, v long")
    g = global_prefix_sum(sdf.repartition(9), ["k"], "v", buckets=8)
    got2 = {r.k: r._start for r in g.collect()}
    acc, want2 = 0, {}
    for k, v in sorted(vals):
        want2[k] = acc
        acc += v
    assert got2 == want2


def test_prefix_sum_internal_column_collision_refuses(spark):
    """r13 ADVICE pin: global_prefix_sum and token_budget_sample are
    exported surface over arbitrary caller frames — a caller column
    named _pid/_local_end/_off (or __h/__n/__prior) must refuse
    loudly, not be silently overwritten and dropped."""
    import pytest

    from sclera_spark.llm import token_budget_sample
    from sclera_spark.llm.text import global_prefix_sum

    df = spark.createDataFrame([(1, 2, 3)], "k long, v long, _pid long")
    with pytest.raises(ValueError, match="_pid"):
        global_prefix_sum(df, ["k"], "v")
    df2 = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="_local_end"):
        global_prefix_sum(df2, ["k"], "v", out_col="_local_end")
    df3 = spark.createDataFrame(
        [(1, "a b", "x")], "doc_id long, text string, __prior string"
    )
    with pytest.raises(ValueError, match="__prior"):
        token_budget_sample(df3, budget=10)
    # clean frames still work (collision check must not false-positive)
    ok = global_prefix_sum(df2, ["k"], "v")
    assert ok.collect()[0]._start == 0


def test_token_budget_fuzz_vs_duckdb(spark, tables, duck):
    """Fuzz the token-budget draw against DuckDB's single-window
    restatement across budgets, salts and physical layouts — the same
    compare the driver's oracle runs, at many more points. Every
    config must match exactly (the md5 order and the tokenizer are
    both engine/DuckDB-portable by construction)."""
    import random

    from pyspark.sql import functions as F

    from sclera_spark.llm import token_budget_sample

    docs = tables["documents"].select("doc_id", "text")
    rnd = random.Random(1303)
    for _ in range(12):
        budget = rnd.choice([1, 37, 500, 3_000, 12_000, 10**9])
        salt = rnd.choice(["", "a", "zz9", "round13"])
        parts = rnd.choice([1, 5, 17])
        out = token_budget_sample(
            docs.repartition(parts), budget=budget, salt=salt
        ).select("doc_id")
        sql = rf"""
            WITH t AS (
              SELECT doc_id,
                     COALESCE(CAST(length(list_filter(string_split_regex(
                         regexp_replace(lower(text), '[^\p{{L}}\p{{N}}\s]', ' ', 'g'),
                         '\s+'), x -> x <> '')) AS BIGINT), 0) AS n,
                     md5(concat('{salt}', CAST(doc_id AS VARCHAR))) AS h
              FROM documents
            ), c AS (
              SELECT doc_id,
                     SUM(n) OVER (ORDER BY h, doc_id
                         ROWS UNBOUNDED PRECEDING) - n AS prior
              FROM t
            )
            SELECT doc_id FROM c WHERE prior < {budget}
        """
        assert_df_equal_duck(out, duck, sql)


def test_topk_per_query_collision_refuses(spark):
    """r14 review pin: topk_per_query refuses caller frames carrying
    its working column names instead of silently dropping them."""
    import pytest

    from sclera_spark.llm import cosine_topk_multi, topk_per_query

    df = spark.createDataFrame(
        [(0, 1, 0.5, 9)], "query_id int, vec_id int, cosine double, __rn int"
    )
    with pytest.raises(ValueError, match="__rn"):
        topk_per_query(df, 3)
    emb = spark.createDataFrame([(1, [1.0, 0.0])], "__v int, embedding array<double>")
    with pytest.raises(ValueError, match="internal"):
        cosine_topk_multi(emb, [(0, [1.0, 0.0])], k=1, id_col="__v")
