from __future__ import annotations

import random

from pyspark.sql import functions as F

from entitymatch_spark.functions.text import tokenize
from entitymatch_spark.operators.ann import cosine_topk, rp_lsh_topk
from entitymatch_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
    simhash_signature,
)
from entitymatch_spark.operators.multimodal import extract_media_features
from entitymatch_spark.operators.textstats import (
    content_fingerprint,
    lang_id,
    quality_expr,
    quality_score,
    winnowing_fingerprints,
)
from entitymatch_spark.sources.synthetic import corpus_to_spark, generate_corpus


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today".split()
    rows = [
        (0, base),
        (1, base),                               # exact dup of 0
        (2, base[:-1] + ["tonight"]),            # near dup (1 token changed)
        (3, [w.upper().lower() for w in base]),  # same content
        (4, "completely different words about spark engines and parquet files here".split()),
    ]
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def test_exact_dedup(spark):
    d = _docs(spark).select("doc_id", F.array_join("tokens", " ").alias("norm_text"))
    out = {r["doc_id"]: (r["canonical_id"], r["n_dups"]) for r in exact_dedup(d).collect()}
    assert out[0] == (0, 3) and out[1] == (0, 3) and out[3] == (0, 3)
    assert out[4] == (4, 1)


def test_minhash_dedup_pairs(spark):
    out = minhash_dedup_pairs(_docs(spark), jaccard_threshold=0.7).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (0, 1) in got and (0, 3) in got and (1, 3) in got
    assert all(4 not in p for p in got)
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert jac[(0, 1)] == 1.0


def test_simhash(spark):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signature(_docs(spark)).collect()}
    assert sigs[0] == sigs[1] == sigs[3]
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
    assert 0 < ham(0, 2) <= 16          # near dup: small distance
    assert ham(0, 4) > 16               # unrelated: large distance
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_dedup_pairs(_docs(spark), max_hamming=16).collect()}
    assert pairs[(0, 1)] == 0 and (0, 3) in pairs
    # deterministic across partitionings
    s2 = {r["doc_id"]: r["simhash"] for r in
          simhash_signature(_docs(spark).repartition(5)).collect()}
    assert s2 == sigs


def test_simhash_recall_beyond_guarantee(spark):
    """simhash_dedup_pairs is EXACT for max_hamming <= bands-1 and a
    verified SUBSET above (dedup.py docstring). Measure both claims
    against brute-force all-pairs hamming on the labeled corpus:

    - precision 1.0 always (the bit_count(xor) verify is exact);
    - recall 1.0 at h <= 3 with the default 4 bands (pigeonhole);
    - recall 1.0 at h <= 7 with bands=8 (extended guarantee);
    - at the contract call (bands=4, h=12) recall is MEASURED and
      asserted above a floor — documenting, not hiding, the subset
      semantics the 4-band blocking gives beyond its guarantee.
    """
    fx = generate_corpus(n_clusters=60, seed=11)
    pages = corpus_to_spark(spark, fx)["pages"]
    docs = pages.select(
        F.col("url").alias("doc_id"), tokenize("text").alias("tokens")
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signature(docs).collect()}
    ids = sorted(sigs)
    truth = {}  # all pairs at hamming <= 12, brute force
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
            if h <= 12:
                truth[(a, b)] = h
    assert truth and any(3 < h <= 12 for h in truth.values()), (
        "fixture must exercise the beyond-guarantee range"
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_dedup_pairs(docs, max_hamming=12).collect()}
    # precision exact: every emitted pair is true, with the true distance
    for p, h in got.items():
        assert truth.get(p) == h, (p, h, truth.get(p))
    # guarantee range is lossless
    guaranteed = {p for p, h in truth.items() if h <= 3}
    assert guaranteed <= set(got), sorted(guaranteed - set(got))[:5]
    # bands=8 extends the lossless range to h <= 7
    got8 = {(r["id_a"], r["id_b"])
            for r in simhash_dedup_pairs(docs, max_hamming=12, bands=8).collect()}
    within7 = {p for p, h in truth.items() if h <= 7}
    assert within7 <= got8, sorted(within7 - got8)[:5]
    # measured subset recall beyond the guarantee: 0.23 on this fixture
    # (most truth pairs sit at hamming 8-12 where a 4-band collision is
    # unlikely) — exactly why the CONTRACT queries call h=3, inside the
    # lossless range. The floor documents the measurement, it is not a
    # quality claim.
    recall = len(set(got) & set(truth)) / len(truth)
    assert 0.15 <= recall < 1.0, recall


def test_ngram_jaccard_pairs(spark):
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 4)], "id_a long, id_b long")
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(pairs, _docs(spark), n=2).collect()}
    assert out[(0, 1)] == 1.0
    assert 0.5 < out[(0, 2)] < 1.0
    assert out[(0, 4)] == 0.0


def _embeddings(spark, n=80, dim=16, seed=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((i, [rng.gauss(0, 1) for _ in range(dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_vs_bruteforce_oracle(spark):
    import math

    e = _embeddings(spark)
    out = cosine_topk(e.filter("vec_id < 3"), e, k=5)
    rows = [(r["qid"], r["nid"], r["cosine"], r["rnk"]) for r in out.collect()]
    vecs = {r["vec_id"]: r["embedding"] for r in e.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    for q in range(3):
        want = sorted(
            ((cos(vecs[q], vecs[n]), n) for n in vecs if n != q),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        got = sorted([(r[1], r[3]) for r in rows if r[0] == q], key=lambda t: t[1])
        assert [n for n, _ in got] == [n for _, n in want]


def test_rp_lsh_recall(spark):
    """Tuned-parameter recall gate: 4 planes x 24 tables measures 0.94
    on this deterministic fixture — the >=0.9 assertion fails on any
    regression in banding/bucketing/probing, not just catastrophes."""
    e = _embeddings(spark, n=120, dim=16)
    q = e.filter("vec_id < 10")
    exact = {(r["qid"], r["nid"]) for r in cosine_topk(q, e, k=5).collect()}
    approx = {(r["qid"], r["nid"]) for r in
              rp_lsh_topk(q, e, dim=16, k=5, n_planes=4, n_tables=24).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall
    # determinism across partitionings
    approx2 = {(r["qid"], r["nid"]) for r in
               rp_lsh_topk(q.repartition(3), e.repartition(7), dim=16, k=5,
                           n_planes=4, n_tables=24).collect()}
    assert approx == approx2


def test_minhash_lsh_vs_bruteforce_ground_truth(spark):
    """MinHash-LSH dedup against the computable ground truth: brute-force
    all-pairs token-set jaccard over the deterministic labeled corpus.

    - precision is exact by construction (the verify filter recomputes
      true jaccard), asserted anyway;
    - recall must be 1.0 for solid near-dups (true jaccard >= 0.9: the
      16x4 band miss probability is ~1e-10 per pair);
    - recall >= 0.95 overall for pairs at the 0.7 threshold (knee
      ~0.5, so 0.7+ pairs are nearly always banded together).
    All seeded/content-hashed -> fully deterministic, no flake."""
    fx = generate_corpus(n_clusters=60, seed=11)
    pages = corpus_to_spark(spark, fx)["pages"]
    docs = pages.select(
        F.col("url").alias("doc_id"), tokenize("text").alias("tokens")
    )
    tok = {r["doc_id"]: set(r["tokens"]) for r in docs.collect()}
    ids = sorted(tok)
    truth = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            u = len(tok[a] | tok[b])
            j = len(tok[a] & tok[b]) / u if u else 0.0
            if j >= 0.7:
                truth[(a, b)] = j
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_dedup_pairs(docs, jaccard_threshold=0.7).collect()
    }
    assert truth, "fixture must contain near-dup pairs"
    # precision: every reported pair is a true >=0.7 pair w/ exact jaccard
    for p, j in got.items():
        assert p in truth and abs(j - truth[p]) < 1e-9
    # recall on solid near-dups is total
    solid = {p for p, j in truth.items() if j >= 0.9}
    assert solid <= set(got), sorted(solid - set(got))[:5]
    # overall recall at the threshold
    assert len(set(got) & set(truth)) / len(truth) >= 0.95


def test_minhash_md5_variant(spark):
    """The portable (md5 token hash, concat band key) MinHash variant:
    same collision structure as the production xxhash64 variant —
    identical docs share every band key, unrelated docs share none —
    and deterministic across partitionings."""
    from entitymatch_spark.operators.blocking import lsh_band_keys, minhash_signature

    d = _docs(spark)
    sigs = minhash_signature(d, num_hashes=16, token_hash="md5")
    keys = lsh_band_keys(sigs, bands=4, rows_per_band=4, band_hash="concat")
    by_doc = {}
    for r in keys.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["key"])
    assert by_doc[0] == by_doc[1] == by_doc[3]       # identical content
    assert len(by_doc[0]) == 4
    assert not (by_doc[0] & by_doc[4])               # unrelated
    assert by_doc[0] & by_doc[2]                     # near dup: >=1 band
    sigs2 = {tuple(r["sig"]) for r in
             minhash_signature(d.repartition(5), num_hashes=16, token_hash="md5").collect()}
    assert sigs2 == {tuple(r["sig"]) for r in sigs.collect()}


def test_hash_embed_properties(spark):
    """Feature-hash embedding: unit-normalized, deterministic across
    partitionings, near-dup docs nearly parallel, unrelated docs not;
    plugs straight into the ANN operators."""
    import math

    from entitymatch_spark.operators.ann import cosine_topk
    from entitymatch_spark.operators.embed import hash_embed

    d = _docs(spark)
    emb = {r["doc_id"]: r["embedding"] for r in hash_embed(d, dim=32).collect()}
    assert set(emb) == {0, 1, 2, 3, 4}
    for v in emb.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
    assert emb[0] == emb[1] == emb[3]  # same content -> same vector

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(emb[0], emb[2]) > 0.8      # near dup: nearly parallel
    assert cos(emb[0], emb[4]) < 0.5      # unrelated
    # determinism across partitionings
    emb2 = {r["doc_id"]: r["embedding"] for r in
            hash_embed(d.repartition(4), dim=32).collect()}
    assert emb == emb2
    # composes with the ANN path
    e = hash_embed(d, dim=32).withColumnRenamed("doc_id", "vec_id")
    top = cosine_topk(e.filter("vec_id = 0"), e, k=2).collect()
    assert {r["nid"] for r in top} == {1, 3}  # its exact dups rank first
    # empty-token docs emit no vector
    empty = spark.createDataFrame(
        [(9, [])], "doc_id long, tokens array<string>"
    )
    assert hash_embed(empty, dim=8).count() == 0


def test_rp_lsh_md5_variant_recall(spark):
    """The portable md5-plane ANN variant is still a working LSH: decent
    recall vs brute force on the fixture and deterministic across
    partitionings."""
    from entitymatch_spark.operators.ann import rp_lsh_md5_topk

    e = _embeddings(spark, n=120, dim=16)
    q = e.filter("vec_id < 10")
    exact = {(r["qid"], r["nid"]) for r in cosine_topk(q, e, k=5).collect()}
    approx = {(r["qid"], r["nid"]) for r in
              rp_lsh_md5_topk(q, e, dim=16, k=5, n_planes=4, n_tables=24).collect()}
    assert len(exact & approx) / len(exact) >= 0.85
    approx2 = {(r["qid"], r["nid"]) for r in
               rp_lsh_md5_topk(q.repartition(3), e.repartition(5), dim=16, k=5,
                               n_planes=4, n_tables=24).collect()}
    assert approx == approx2


def test_simhash_md5_variant(spark):
    """Portable SimHash: same dup structure as the packed variant."""
    from entitymatch_spark.operators.dedup import simhash_md5_dedup_pairs

    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_md5_dedup_pairs(_docs(spark), max_hamming=16).collect()}
    assert pairs[(0, 1)] == 0 and pairs[(0, 3)] == 0
    assert (0, 2) in pairs and 0 < pairs[(0, 2)] <= 16
    assert all(4 not in p for p in pairs)


def test_lang_id_and_quality(spark):
    rows = [
        (1, "the cat is on the mat and it is happy with the sun".split()),
        (2, "der hund ist nicht mit der katze und das ist gut".split()),
        (3, "le chat est sur la table et il est content pour nous".split()),
        (4, "zzz qqq www".split()),
    ]
    d = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    pred = {r["doc_id"]: r["pred_lang"] for r in lang_id(d).collect()}
    assert pred == {1: "en", 2: "de", 3: "fr", 4: "und"}
    q = {r["doc_id"]: r for r in quality_score(d).collect()}
    assert q[4]["stop_ratio"] == 0.0 and q[4]["uniq_ratio"] == 1.0
    assert q[1]["stop_ratio"] > 0.3
    assert all(0 <= r["quality"] <= 1.0001 for r in q.values())


def test_quality_at_least_exact_boundary(spark):
    """The rational gate admits docs sitting EXACTLY on the threshold
    (0.4*u/n + 0.3*(1-s/n) + 0.3*min(tl/8n,1) compared by integer
    cross-multiplication — the float sum 0.1+0.3+0.15 need not equal
    0.55 bit-for-bit, the gate must not care)."""
    from entitymatch_spark.operators.textstats import quality_at_least

    # 16 tokens, no stopwords, every token 4 chars (tl=64, uncapped):
    # u=4 -> quality = 0.4*(4/16) + 0.3 + 0.3*(64/128) = 0.55 exactly
    # u=6 -> 0.4*(6/16) + 0.3 + 0.15                   = 0.60 exactly
    q55 = ["aaaa", "bbbb", "cccc", "dddd"] * 4
    q60 = ["aaaa", "bbbb", "cccc", "dddd", "eeee", "ffff"] + ["aaaa"] * 10
    rows = [(55, q55), (60, q60), (0, [])]
    d = spark.createDataFrame(rows, "doc_id long, tokens array<string>")

    def kept(threshold):
        return {
            r["doc_id"]
            for r in d.filter(quality_at_least("tokens", threshold)).collect()
        }

    # exact-boundary docs PASS at their own threshold...
    assert kept((11, 20)) == {55, 60}
    assert kept((3, 5)) == {60}
    # ...and FAIL one ten-thousandth above it; empty docs always fail
    assert kept((5501, 10000)) == {60}
    assert kept((6001, 10000)) == set()

    # agreement with the float formula away from boundaries, on real text
    corpus = corpus_to_spark(spark, generate_corpus(n_clusters=30, seed=5))[
        "pages"
    ].select("url", tokenize("text").alias("tokens"))
    both = corpus.select(
        "url",
        quality_at_least("tokens", (62, 100)).alias("gate"),
        (F.size("tokens") > 0).alias("nonempty"),
        quality_expr("tokens").alias("q"),
    ).collect()
    for r in both:
        if r["nonempty"] and abs(r["q"] - 0.62) > 1e-9:
            assert r["gate"] == (r["q"] >= 0.62), r


def test_winnowing_shared_run_guarantee(spark):
    rng = random.Random(7)
    shared = [f"s{i}" for i in range(12)]  # a shared 12-token run
    a = [f"a{rng.randrange(99)}" for _ in range(20)] + shared + ["a_end"]
    b = ["b_start"] + shared + [f"b{rng.randrange(99)}" for _ in range(25)]
    c = [f"c{i}" for i in range(30)]
    d = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, tokens array<string>"
    )
    fps = winnowing_fingerprints(d, k=4, window=5)
    sets = {}
    for r in fps.collect():
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    # shared run of 12 >= k + window - 1 = 8 -> must share a fingerprint
    assert sets[0] & sets[1]
    assert not (sets[0] & sets[2])


def test_content_fingerprint_matches_dup(spark):
    d = _docs(spark)
    fp = {r["doc_id"]: r["fp"] for r in content_fingerprint(d).collect()}
    assert fp[0] == fp[1] == fp[3] and fp[0] != fp[4]


def test_multimodal_features(spark):
    fx = generate_corpus(n_clusters=10, seed=42)
    pages = corpus_to_spark(spark, fx)["pages"]
    media = pages.select(
        F.col("url").alias("doc_id"),
        F.col("html").alias("payload"),
        F.lit("image").alias("media_type"),
    )
    out = extract_media_features(media)
    rows = out.collect()
    assert len(rows) == pages.count()
    assert all(r["decode_status"] == "stubbed" for r in rows)
    assert all(r["n_bytes"] > 0 and 16 <= r["width"] and 16 <= r["height"] for r in rows)
    # deterministic: same payload -> same features
    again = {r["doc_id"]: (r["content_md5"], r["width"], r["height"]) for r in
             extract_media_features(media.repartition(4)).collect()}
    first = {r["doc_id"]: (r["content_md5"], r["width"], r["height"]) for r in rows}
    assert first == again
    # null payload probe
    nulls = spark.createDataFrame(
        [("x", None, "image")], "doc_id string, payload binary, media_type string"
    )
    r = extract_media_features(nulls).collect()[0]
    assert r["n_bytes"] == 0 and r["decode_status"] == "stubbed"


def test_ivf_topk_recall_vs_bruteforce(spark):
    """IVF recall gate, tuned on the fixture: the 8 data-row centroids
    give unbalanced cells, so recall climbs 0.64/0.74/0.83/0.90 at
    nprobe 2/3/4/5 (all deterministic). Gate at nprobe=5 >= 0.9 so a
    regression in cell assignment or probing fails the test; a second
    nprobe=2 bound pins the cheap-probe regime too."""
    from entitymatch_spark.operators.ann import cosine_topk, ivf_topk

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    exact = {(r["qid"], r["nid"]) for r in cosine_topk(q, e, k=5).collect()}
    approx_rows = ivf_topk(q, e, cents, k=5, nprobe=5).collect()
    approx = {(r["qid"], r["nid"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall
    cheap = {(r["qid"], r["nid"]) for r in ivf_topk(q, e, cents, k=5, nprobe=2).collect()}
    assert len(exact & cheap) / len(exact) >= 0.6
    # exactness of reranked cosines: spot-check against brute force values
    exact_cos = {(r["qid"], r["nid"]): r["cosine"] for r in cosine_topk(q, e, k=5).collect()}
    for r in approx_rows:
        key = (r["qid"], r["nid"])
        if key in exact_cos:
            assert abs(r["cosine"] - exact_cos[key]) < 1e-9


def test_resize_and_frame_sample_plumbing(spark):
    """Multimodal resize + frame sampling: deterministic stubbed codecs,
    real mapInPandas plumbing (row-multiplying output, stable schema,
    partition independence)."""
    from entitymatch_spark.operators.multimodal import resize_media, sample_frames

    media = spark.createDataFrame(
        [("a", b"payload-one", "image"), ("b", b"payload-two", "video"), ("c", None, "video")],
        "doc_id string, payload binary, media_type string",
    )
    rs = resize_media(media, out_w=64, out_h=64).collect()
    assert len(rs) == 3
    assert all(r["out_w"] == 64 and r["out_h"] == 64 and r["decode_status"] == "stubbed" for r in rs)
    assert all(len(bytes(r["payload"])) == 64 for r in rs)
    # determinism across partitionings
    again = {r["doc_id"]: bytes(r["payload"]) for r in resize_media(media.repartition(3), out_w=64, out_h=64).collect()}
    assert {r["doc_id"]: bytes(r["payload"]) for r in rs} == again

    fr = sample_frames(media, every_ms=500, max_frames=4)
    rows = fr.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, frames in by_doc.items():
        assert 1 <= len(frames) <= 4
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(frames)))
        assert all(f["frame_ts_ms"] == f["frame_idx"] * 500 for f in frames)
    again2 = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"]) for r in sample_frames(media.repartition(3), every_ms=500, max_frames=4).collect()}
    assert {(r["doc_id"], r["frame_idx"]): bytes(r["frame"]) for r in rows} == again2


def test_token_count_bpe_properties(spark):
    from entitymatch_spark.operators.textstats import token_count_bpe

    d = spark.createDataFrame(
        [(1, "hello world"), (2, "don't stop, it's 12345 now!"), (3, ""), (4, "internationalization")],
        "doc_id long, norm_text string",
    )
    rows = {r["doc_id"]: r for r in token_count_bpe(d).collect()}
    assert rows[1]["n_ws"] == 2 and rows[1]["n_words"] == 2
    # "hello" -> hell+o (2 pieces), "world" -> worl+d (2)
    assert rows[1]["n_pieces"] == 4
    assert rows[3]["n_ws"] == 0 and rows[3]["n_words"] == 0 and rows[3]["n_pieces"] == 0
    # 20-letter word -> 5 four-letter pieces
    assert rows[4]["n_words"] == 1 and rows[4]["n_pieces"] == 5
    # pieces >= words >= ws-ish ordering holds on real text
    r2 = rows[2]
    assert r2["n_pieces"] >= r2["n_words"] >= r2["n_ws"]


def test_dedup_survivors_chain_closure(spark):
    # A~B and B~C but NOT A~C: pairwise keep-one would keep A and C;
    # the component closure must keep only one of the chain.
    from entitymatch_spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r["n_members"] for r in
           dedup_survivors(docs, pairs).collect()}
    # survivors: 0 (stands for 0,1,2), 3 (unique), 4 (stands for 4,5)
    assert out == {0: 3, 3: 1, 4: 2}
    # survivors' member counts cover the whole corpus exactly once
    assert sum(out.values()) == 6


def test_quality_gate_matches_float_formula(spark):
    """Drift sweep: quality_at_least's hand-derived integer form must
    agree with _quality_parts' float formula everywhere off the exact
    threshold boundary (ON the boundary the integer form is the spec —
    see test_quality_at_least_exact_boundary). Seeded random docs mix
    stopwords, repeats, and short/long tokens; any future edit to the
    formula weights or the mean-length cap that misses the other copy
    fails here."""
    import random

    from entitymatch_spark.operators.textstats import (
        EN_STOPWORDS,
        quality_at_least,
        quality_expr,
    )

    rng = random.Random(11)
    vocab = ["x", "tokn", "abcdefgh", "yz", "longtokenword"] + list(
        EN_STOPWORDS[:8]
    )
    rows = [
        (i, [rng.choice(vocab) for _ in range(rng.randrange(1, 30))])
        for i in range(300)
    ]
    d = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    for thr in ((617, 1000), (11, 20), (3, 5), (499, 1000)):
        got = d.select(
            "doc_id",
            quality_at_least("tokens", thr).alias("gate"),
            quality_expr("tokens").alias("q"),
        ).collect()
        t = thr[0] / thr[1]
        bad = [
            (r["doc_id"], r["q"], r["gate"])
            for r in got
            if abs(r["q"] - t) > 1e-9 and r["gate"] != (r["q"] >= t)
        ]
        assert not bad, (thr, bad[:5])


def test_quality_stopwords_with_apostrophes(spark):
    """Stopwords ride in as literals, never a SQL splice: a normal
    French list (l', d', qu') used to throw a ParseException from the
    quoted splice inside filter(...)."""
    from entitymatch_spark.operators.textstats import (
        quality_at_least,
        quality_score,
    )

    docs = spark.createDataFrame(
        [(1, ["l'", "maison", "d'", "or"]), (2, ["qu'", "qu'", "qu'", "qu'"])],
        "doc_id long, tokens array<string>",
    )
    rows = {r.doc_id: r for r in quality_score(docs, stopwords=["l'", "d'", "qu'"]).collect()}
    assert rows[1].stop_ratio == 0.5   # 2 of 4 tokens are stopwords
    assert rows[2].stop_ratio == 1.0
    gated = docs.filter(
        quality_at_least("tokens", (1, 100), stopwords=["l'", "d'", "qu'"])
    )
    assert {r.doc_id for r in gated.collect()} == {1, 2}


def test_ann_exclude_self_flag(spark):
    """exclude_self=False keeps a corpus row whose id equals a query id
    — required when queries and corpus have independent id namespaces
    (the default drop silently hid that row's true neighbors)."""
    from entitymatch_spark.operators.ann import cosine_topk

    queries = spark.createDataFrame(
        [(7, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [(7, [1.0, 0.0]), (8, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    default = cosine_topk(queries, corpus, k=2).collect()
    assert [r.nid for r in default] == [8]  # self-id dropped
    both = cosine_topk(queries, corpus, k=2, exclude_self=False).collect()
    assert [r.nid for r in sorted(both, key=lambda r: r.rnk)] == [7, 8]


def test_rp_lsh_buckets_rejects_bad_embeddings(spark):
    """A null or wrong-length embedding raises a NAMED error instead of
    an opaque np.stack shape failure deep in the Arrow worker."""
    import pytest
    from pyspark.errors import PythonException

    from entitymatch_spark.operators.ann import rp_lsh_buckets

    bad = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(PythonException, match="length-2 vector"):
        rp_lsh_buckets(bad, dim=2).collect()
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(PythonException, match="length-2 vector"):
        rp_lsh_buckets(ragged, dim=2).collect()


def test_exact_dedup_null_text_is_never_a_duplicate(spark):
    """md5(NULL) is NULL and a window PARTITION BY groups NULLs
    together: two contentless docs must NOT form a 'duplicate' group
    (one of them would be deleted as a copy of unrelated content)."""
    from entitymatch_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None)],
        "doc_id long, norm_text string",
    )
    rows = {r.doc_id: r for r in exact_dedup(docs).collect()}
    assert rows[1].canonical_id == 1 and rows[2].canonical_id == 1
    assert rows[1].n_dups == 2
    assert rows[3].canonical_id == 3 and rows[3].n_dups == 1
    assert rows[4].canonical_id == 4 and rows[4].n_dups == 1
    assert rows[3].fingerprint is None


def test_minhash_dedup_uses_exact_integer_gate(spark):
    """minhash_dedup_pairs verifies through verify_token_jaccard — the
    module's one gate — so a pair EXACTLY at the threshold is decided by
    integer cross-multiplication, and the float jaccard column is still
    reported."""
    from entitymatch_spark.operators.dedup import minhash_dedup_pairs

    # two docs sharing 7 of 10 distinct tokens: jaccard exactly 7/10
    t = [f"t{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, t), (2, t[:7] + ["x1", "x2", "x3"])],
        "doc_id long, tokens array<string>",
    )
    out = minhash_dedup_pairs(
        docs, num_hashes=16, bands=8, rows_per_band=2,
        jaccard_threshold=(7, 13),  # inter=7, union=13
    ).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    assert abs(out[0].jaccard - 7 / 13) < 1e-12


def test_sample_frames_rejects_nonpositive_max(spark):
    """max_frames < 1 fails at the driver with a named error, not a
    worker-side ZeroDivisionError at action time."""
    import pytest

    from entitymatch_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, b"xx")], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="max_frames"):
        sample_frames(df, max_frames=0)


def test_synthetic_synonyms_carry_identity_rows(spark):
    """The fixture synonym map must be usable by interpret, whose
    replacement semantics require each key's identity row (mouse ->
    {mouse 1.0, mice 0.9}) — without it every key token loses its
    exact match."""
    from entitymatch_spark.sources.synthetic import generate_corpus

    syn = generate_corpus(n_clusters=2, seed=1).synonyms
    keys = set(syn["token"])
    idents = {
        (t, a) for t, a, w in syn.itertuples(index=False) if t == a and w == 1.0
    }
    assert {(k, k) for k in keys} <= idents


def test_ann_zero_vector_never_outranks_real_neighbors(spark):
    """A zero-magnitude embedding (dead doc) must score cosine 0.0, not
    NaN — Spark orders NaN above every number, so an unguarded division
    would rank the dead vector FIRST in every top-k it reaches."""
    from entitymatch_spark.operators.ann import cosine_topk

    e = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),   # near doc 0
            (2, [0.0, 0.0, 0.0]),   # dead embedding
            (3, [0.1, 1.0, 0.0]),   # weakly similar to doc 0
        ],
        "vec_id long, embedding array<double>",
    )
    rows = cosine_topk(e.filter("vec_id = 0"), e, k=3).collect()
    order = [r["nid"] for r in rows]
    # every nonzero-similarity vector outranks the dead one
    assert order == [1, 3, 2]
    dead = rows[-1]
    assert dead["cosine"] == 0.0              # scores 0.0, not NaN


def test_remove_boilerplate_lines_c4_rule(spark):
    """The C4 rule end-to-end: a line recurring >= 3 times corpus-wide
    vanishes from every doc; rarer lines stay; blank lines are
    structural (kept, never counted); a doc of pure boilerplate keeps
    its row with empty clean_text; line order is preserved."""
    from entitymatch_spark.operators.dedup import remove_boilerplate_lines

    bp = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"alpha body\n{bp}\nmore alpha"),
            (2, f"{bp}\nbeta body\n\nbeta tail"),
            (3, f"gamma start\ngamma end\n{bp}"),
            (4, bp),                       # pure boilerplate
            (5, "rare line\nrare line"),   # 2 < min_occurrences, kept
            (6, None),                     # NULL text must not vanish
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(docs, min_occurrences=3).collect()
    }
    assert len(out) == 6
    assert out[6]["clean_text"] == "" and out[6]["n_lines"] == 1
    assert out[6]["n_removed"] == 0
    assert out[1]["clean_text"] == "alpha body\nmore alpha"
    assert out[2]["clean_text"] == "beta body\n\nbeta tail"  # blank kept
    assert out[3]["clean_text"] == "gamma start\ngamma end"
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 1
    assert out[5]["clean_text"] == "rare line\nrare line"
    assert [out[i]["n_removed"] for i in (1, 2, 3, 5)] == [1, 1, 1, 0]
    assert out[2]["n_lines"] == 4

    import pytest

    with pytest.raises(ValueError):
        remove_boilerplate_lines(docs, min_occurrences=1)


def test_remove_boilerplate_lines_matches_python_reference(spark):
    """One-job fuzz: a seeded random multi-line corpus through the Spark
    operator vs an independent driver-side Python reference of the C4
    rule (count non-empty lines corpus-wide, drop every occurrence of
    those at >= min_occ, rejoin in order). Catches any divergence in
    counting scope, blank handling, ordering, or the empty-doc path."""
    import random
    from collections import Counter

    from entitymatch_spark.operators.dedup import remove_boilerplate_lines

    rng = random.Random(1234)
    vocab = ["alpha", "beta", "gamma", "delta", "nav", "home", "login"]
    def line():
        return " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 4)))
    # a boilerplate pool reused across docs + unique filler + blanks
    pool = [line() for _ in range(6)]
    docs = []
    for i in range(60):
        n = rng.randrange(1, 7)
        ls = [
            rng.choice(pool) if rng.random() < 0.4
            else ("" if rng.random() < 0.15 else f"{line()} u{i}_{j}")
            for j in range(n)
        ]
        docs.append((i, "\n".join(ls)))

    min_occ = 3
    cnt = Counter(
        l for _, t in docs for l in t.split("\n") if l != ""
    )
    flagged = {l for l, c in cnt.items() if c >= min_occ}
    want = {}
    for i, t in docs:
        ls = t.split("\n")
        kept = [l for l in ls if l == "" or l not in flagged]
        want[i] = ("\n".join(kept), len(ls), len(ls) - len(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(df, min_occurrences=min_occ).collect()
    }
    assert got == want
    assert any(v[2] > 0 for v in want.values())  # the fuzz exercised removal

def test_duplicate_token_spans_exactsubstr_rule(spark):
    """ExactSubstr semantics on a hand-built fixture: cross-doc shared
    runs merge into one maximal span per doc, a window repeated WITHIN
    one doc counts toward min_occurrences, docs shorter than the window
    are excluded, and back-to-back windows (s == previous span end)
    merge rather than split."""
    import pytest

    from entitymatch_spark.operators.dedup import duplicate_token_spans

    rows = [
        (1, "a b c d e f g h i j k l".split()),  # shares a..h with doc 2
        (2, "x y a b c d e f g h q r".split()),
        (3, "z z z".split()),                    # len 3 < window 4
        (4, "p q r s p q r s p q r s".split()),  # internal repeat only
    ]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<string>")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_windows"]
        for r in duplicate_token_spans(df, window=4, min_occurrences=2).collect()
    }
    # doc 1: run a..h = indices 0..7 -> 5 windows of width 4, one span
    # doc 2: same run at indices 2..9
    # doc 4: every window duplicated internally -> whole doc one span
    assert got == {(1, 0, 8): 5, (2, 2, 10): 5, (4, 0, 12): 9}

    with pytest.raises(ValueError, match="window must be >= 2"):
        duplicate_token_spans(df, window=1)
    with pytest.raises(ValueError, match="min_occurrences must be >= 2"):
        duplicate_token_spans(df, min_occurrences=1)


def test_duplicate_token_spans_matches_python_reference(spark):
    """One-job fuzz: a seeded random token corpus (small vocab so
    duplicate windows arise naturally, plus planted verbatim passages)
    through the Spark operator vs an independent driver-side Python
    reference of the ExactSubstr rule (count windows corpus-wide by
    content, flag those at >= min_occ, merge overlapping-or-adjacent
    flagged windows per doc). Catches divergence in counting scope,
    merge boundary (s == end vs s > end), short-doc exclusion, or the
    fold's last-span arithmetic."""
    import random
    from collections import Counter

    from entitymatch_spark.operators.dedup import duplicate_token_spans

    rng = random.Random(4321)
    W, MIN = 5, 2
    vocab = [f"t{i}" for i in range(12)]
    passage = [rng.choice(vocab) for _ in range(9)]  # planted verbatim run
    docs = []
    for i in range(50):
        n = rng.randrange(2, 20)
        toks = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.4:
            at = rng.randrange(0, len(toks) + 1)
            toks = toks[:at] + passage + toks[at:]
        docs.append((i, toks))

    cnt = Counter()
    for _, toks in docs:
        for s in range(len(toks) - W + 1):
            cnt[tuple(toks[s : s + W])] += 1
    want = set()
    for i, toks in docs:
        starts = [
            s
            for s in range(len(toks) - W + 1)
            if cnt[tuple(toks[s : s + W])] >= MIN
        ]
        spans = []
        for s in starts:
            if spans and s <= spans[-1][1]:
                spans[-1] = (spans[-1][0], s + W, spans[-1][2] + 1)
            else:
                spans.append((s, s + W, 1))
        for st, en, nw in spans:
            want.add((i, st, en, nw))

    df = spark.createDataFrame(docs, "doc_id long, tokens array<string>")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_token_spans(df, window=W, min_occurrences=MIN).collect()
    }
    assert got == want
    assert len(want) > 20  # the fuzz exercised real merging

def test_strip_duplicate_spans_roundtrip(spark):
    """detect -> strip closes the ExactSubstr loop: stripped docs lose
    exactly the span tokens, span-free docs pass through unchanged with
    n_removed = 0, and the result matches a direct Python strip of the
    reference spans."""
    from entitymatch_spark.operators.dedup import (
        duplicate_token_spans,
        strip_duplicate_spans,
    )

    rows = [
        (1, "a b c d e f g h i j k l".split()),
        (2, "x y a b c d e f g h q r".split()),
        (3, "z w z w z".split()),               # no duplicate windows
        (4, "p q r s p q r s p q r s".split()),
    ]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<string>")
    spans = duplicate_token_spans(df, window=4, min_occurrences=2)
    got = {
        r["doc_id"]: (r["clean_tokens"], r["n_removed"])
        for r in strip_duplicate_spans(df, spans).collect()
    }
    span_map = {}
    for r in spans.collect():
        span_map.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    want = {}
    for i, toks in rows:
        sp = span_map.get(i, [])
        kept = [
            t for j, t in enumerate(toks)
            if not any(s <= j < e for s, e in sp)
        ]
        want[i] = (kept, len(toks) - len(kept))
    assert got == want
    assert got[3] == ("z w z w z".split(), 0)  # untouched doc intact
    assert got[4] == ([], 12)                  # fully-duplicate doc empties


def test_group_quantiles_exact_and_approx(spark):
    import pytest

    from entitymatch_spark.operators.textstats import group_quantiles

    df = spark.createDataFrame(
        [("a", v) for v in [10, 20, 30, 40]] + [("b", 5)],
        "grp string, v long",
    )
    got = {
        r["grp"]: r
        for r in group_quantiles(df, "v", "grp", (0.25, 0.5)).collect()
    }
    # linear interpolation between closest ranks: for [10,20,30,40]
    # p25 = 10 + 0.75*(20-10) = 17.5, p50 = 20 + 0.5*(30-20) = 25
    a = got["a"]
    assert (a["n"], a["min_value"], a["max_value"]) == (4, 10, 40)
    assert a["p25"] == pytest.approx(17.5)
    assert a["p50"] == pytest.approx(25.0)
    b = got["b"]  # single value: every quantile is it
    assert (b["p25"], b["p50"]) == (5.0, 5.0)

    # approx path: bounded-state sketch, lands on a real value near
    # the exact rank for a tight distribution
    approx = {
        r["grp"]: r["p50"]
        for r in group_quantiles(
            df, "v", "grp", (0.5,), exact=False
        ).collect()
    }
    assert approx["a"] in (20, 30)
    assert approx["b"] == 5

    with pytest.raises(ValueError, match=r"probs must be in \[0, 1\]"):
        group_quantiles(df, "v", "grp", (1.5,))


def test_lang_id_null_tokens_is_und(spark):
    """A NULL tokens array (NULL text upstream) must classify 'und',
    not fall through the NULL-condition when-chain to 'fr'."""
    from entitymatch_spark.operators.textstats import lang_id

    df = spark.createDataFrame(
        [(1, None), (2, []), (3, ["the", "of"])],
        "doc_id long, tokens array<string>",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got == {1: "und", 2: "und", 3: "en"}


def test_quality_handles_awkward_column_name(spark):
    """The quality expressions must not splice the tokens column name
    into SQL text — a spaced name exercises the F.aggregate path."""
    from entitymatch_spark.operators.textstats import (
        quality_at_least,
        quality_score,
    )

    df = spark.createDataFrame(
        [(1, ["alpha", "beta", "gamma", "delta"])],
        "doc_id long, `token list` array<string>",
    )
    r = quality_score(df, tokens_col="token list").collect()[0]
    assert r["n_tokens"] == 4 and r["uniq_ratio"] == 1.0
    kept = df.filter(quality_at_least("token list", (1, 2))).count()
    assert kept == 1


def test_group_quantiles_rejects_colliding_probs(spark):
    import pytest

    from entitymatch_spark.operators.textstats import group_quantiles

    df = spark.createDataFrame([("a", 1)], "grp string, v long")
    with pytest.raises(ValueError, match="collide"):
        group_quantiles(df, "v", "grp", (0.25, 0.254))


def test_hash_embed_skips_null_tokens(spark):
    """A NULL element in one doc's tokens array must not kill the job
    with NULL_MAP_KEY; it is simply not a token."""
    from pyspark.sql import functions as F

    from entitymatch_spark.operators.embed import hash_embed

    docs = spark.createDataFrame(
        [("d1", ["a", None, "b"]), ("d2", ["a", "b"])],
        "doc_id string, tokens array<string>",
    )
    got = {r["doc_id"]: r["embedding"] for r in hash_embed(docs, dim=8).collect()}
    assert got["d1"] == got["d2"]  # the NULL contributed nothing
