"""Training-data pipeline operators: dedup, ANN, text, multimodal."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different content about spark clusters and shuffles here now"),
        (4, "completely different content about spark clusters and shuffle here now"),  # near dup of 3
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    from essentials_spark.text.analysis import exact_dedup

    out = {r["doc_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert out[0] == 2 and 1 not in out  # 0 kept, 1 dropped
    assert out[3] == 1


def test_minhash_lsh_finds_near_dups(spark, docs):
    from essentials_spark.dedup.minhash import minhash_lsh_pairs

    pairs = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs, shingle_k=3, min_sim=0.4).collect()}
    assert (0, 1) in pairs  # identical docs always collide
    assert (0, 2) in pairs or (3, 4) in pairs  # near dups found
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_minhash_dedup_clusters(spark, docs):
    from essentials_spark.dedup.minhash import minhash_dedup

    out = {r["id"]: (r["cluster"], r["keep"]) for r in minhash_dedup(docs, shingle_k=3, min_sim=0.4).collect()}
    assert out[0][0] == out[1][0]  # same cluster
    assert out[0][1] is True and out[1][1] is False
    assert out[5][1] is True  # singleton kept


def test_portable_hash_matches_hashlib(spark):
    """The md5-int primitive (functions/portable_hash.py) must equal
    hashlib's — the single source of truth both Spark and the DuckDB
    oracle SQL reduce to."""
    import hashlib

    from essentials_spark.functions.portable_hash import md5_int60, sql_md5_int60

    import duckdb

    samples = ["aa bb cc", "", "tok", "Ünïcode test"]
    expected = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in samples]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["h"] for r in df.select(md5_int60(F.col("s")).alias("h")).collect()]
    assert got == expected
    con = duckdb.connect()
    for s, e in zip(samples, expected):
        assert con.execute(f"SELECT {sql_md5_int60('?')}", [s]).fetchone()[0] == e


def test_minhash_portable_finds_same_dups(spark, docs):
    """Portable (md5/affine) mode is a different hash family but must
    find the same planted duplicate structure."""
    from essentials_spark.dedup.minhash import minhash_dedup

    out = {
        r["id"]: (r["cluster"], r["keep"])
        for r in minhash_dedup(docs, shingle_k=3, min_sim=0.4, portable=True).collect()
    }
    assert out[0][0] == out[1][0]
    assert out[0][1] is True and out[1][1] is False
    assert out[5][1] is True


def test_simhash_portable(spark, docs):
    from essentials_spark.dedup.simhash import simhash, simhash_pairs

    sigs = {r["id"]: r["simhash"] for r in simhash(docs, portable=True).collect()}
    assert sigs[0] == sigs[1]  # identical docs -> identical signature
    assert all(0 <= v < (1 << 32) for v in sigs.values())  # 32-bit portable sigs
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=8, portable=True).collect()}
    assert pairs.get((0, 1)) == 0


def test_simhash_pairs(spark, docs):
    from essentials_spark.dedup.simhash import simhash_pairs

    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=8).collect()}
    assert pairs.get((0, 1)) == 0  # identical => hamming 0
    assert (0, 3) not in pairs


def test_lsh_bucket_cap_bounds_pathological_bucket(spark):
    """1k identical docs = one degenerate band bucket. All-pairs would
    be ~500k candidates; the cap must bound generation to
    O(bucket x chain_width) while keeping the duplicate cluster
    connected for CC-based dedup."""
    from essentials_spark.dedup.minhash import minhash_dedup, minhash_lsh_pairs

    n = 1000
    rows = [(i, "boilerplate header lorem ipsum repeated body text exactly the same") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, shingle_k=3, min_sim=0.5, bucket_cap=64, chain_width=2)
    n_pairs = pairs.count()
    # chain pairing: <= bands-deduped n*chain_width (vs ~499500 all-pairs)
    assert 0 < n_pairs <= n * 2
    out = minhash_dedup(docs, shingle_k=3, min_sim=0.5, bucket_cap=64, chain_width=2)
    clusters = out.select("cluster").distinct().count()
    kept = out.filter(F.col("keep")).count()
    assert clusters == 1 and kept == 1  # transitive cluster intact


def test_simhash_bucket_cap(spark):
    from essentials_spark.dedup.simhash import simhash_pairs

    n = 300
    rows = [(i, "identical text for every single row here") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_pairs(docs, max_hamming=3, bucket_cap=32, chain_width=2)
    n_pairs = pairs.count()
    assert 0 < n_pairs <= n * 2
    # chain connectivity: the pair graph must span all n docs
    ids = {r["a"] for r in pairs.collect()} | {r["b"] for r in pairs.collect()}
    assert len(ids) == n


def test_embedding_cosine_pairs_capped(spark):
    from essentials_spark.dedup.embedding import embedding_cosine_pairs

    rng = np.random.RandomState(3)
    v = rng.standard_normal(16).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i in range(200)]  # 200 identical vectors
    rows += [(500 + i, [float(x) for x in rng.standard_normal(16)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_cosine_pairs(df, min_sim=0.99, bucket_cap=32)
    n_pairs = pairs.count()
    assert 0 < n_pairs <= 200 * 2 * 2  # bounded, not ~19900 all-pairs
    got = pairs.collect()
    assert all(r["sim"] >= 0.99 for r in got)


def test_multimodal_large_payload_contract(spark):
    """Schema/Arrow-batching contract: a payload row in the tens of MB
    must flow through decode_images without driver collection or
    per-row Python, producing the same feature shape."""
    import pandas as pd

    from essentials_spark.multimodal.media import FEATURE_SCHEMA, decode_images

    big = bytes(range(256)) * (64 * 1024 * 4)  # 64 MiB deterministic payload
    pdf = pd.DataFrame(
        {
            "media_id": [7],
            "kind": ["image"],
            "payload": [big],
            "mime": ["application/octet-stream"],
            "width": [512],
            "height": [512],
            "duration_ms": [0],
        }
    )
    media = spark.createDataFrame(pdf)
    out = decode_images(media, batch_features=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_bytes"] == len(big) and len(r["feature"]) == 8
    assert r["mean_byte"] == pytest.approx(127.5)


def test_ngram_jaccard(spark, docs):
    from essentials_spark.dedup.jaccard import ngram_jaccard_verify

    cand = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "a long, b long")
    out = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_verify(cand, docs, n=3).collect()}
    assert out[(0, 1)] == 1.0
    assert 0.0 < out[(0, 2)] < 1.0
    assert out[(0, 3)] < 0.1


def test_ann_brute_force_vs_numpy(spark):
    from essentials_spark.ann.cosine import brute_force_topk

    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)], "vec_id long, embedding array<float>"
    )
    out = brute_force_topk(df.filter(F.col("vec_id") < 3), df, k=5).collect()
    v64 = vecs.astype(np.float64)  # engine computes in float64
    norm = v64 / np.linalg.norm(v64, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(3):
        order = [i for i in np.argsort(-np.round(sims[q], 6), kind="stable") if i != q][:5]
        got = [r["neighbor_id"] for r in sorted((x for x in out if x["query_id"] == q), key=lambda r: r["rank"])]
        exp_sims = sorted(np.round(sims[q][order], 4), reverse=True)
        got_sims = sorted((round(r["sim"], 4) for x in out if x["query_id"] == q for r in [x]), reverse=True)
        assert got_sims == [float(s) for s in exp_sims]
        assert set(got) == set(int(i) for i in order) or got_sims == [float(s) for s in exp_sims]


def test_ann_lsh_recall(spark):
    from essentials_spark.ann.cosine import brute_force_topk, lsh_topk

    rng = np.random.RandomState(1)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    # plant obvious near-neighbors for the first 3 queries
    for q in range(3):
        base[q + 20] = base[q] + 0.01 * rng.standard_normal(16).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(30)], "vec_id long, embedding array<float>"
    )
    q = df.filter(F.col("vec_id") < 3)
    exact = {
        r["query_id"]: r["neighbor_id"]
        for r in brute_force_topk(q, df, k=1).collect()
    }
    approx = lsh_topk(q, df, k=1, bits=8, tables=6, dim=16).collect()
    hits = sum(1 for r in approx if exact.get(r["query_id"]) == r["neighbor_id"])
    assert hits >= 2  # high recall on planted neighbors


def test_language_id(spark):
    from essentials_spark.text.analysis import language_id

    df = spark.createDataFrame(
        [
            (0, "the cat and the dog of a house"),
            (1, "el perro de la casa que ladra y come"),
            (2, "der hund und die katze in das haus ein"),
            (3, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert out[0] == "en" and out[1] == "es" and out[2] == "de" and out[3] == "und"


def test_multimodal_decode_plumbing(spark):
    from essentials_spark.multimodal.media import decode_images, sample_video_frames, synth_media

    media = synth_media(spark, n=30)
    feats = decode_images(media).collect()
    assert len(feats) == media.filter("kind = 'image'").count()
    for r in feats:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
    # deterministic
    feats2 = decode_images(synth_media(spark, n=30)).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))

    frames = sample_video_frames(media, every_ms=5000)
    assert frames.count() > 0
    assert frames.columns == ["media_id", "payload", "width", "height", "ts_ms"]


def _make_ppm(w, h, value_fn):
    import numpy as np

    arr = np.fromfunction(lambda y, x, c: value_fn(y, x, c), (h, w, 3)).astype(np.uint8)
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + arr.tobytes(), arr


def _make_bmp(w, h, value_fn):
    """Minimal uncompressed 24-bit BMP (bottom-up, padded rows)."""
    import numpy as np

    rgb = np.fromfunction(lambda y, x, c: value_fn(y, x, c), (h, w, 3)).astype(np.uint8)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    off = 14 + 40
    header = (
        b"BM" + (off + len(data)).to_bytes(4, "little") + b"\0\0\0\0" + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
        + b"\0" * 16
    )
    return header + data, rgb


def _make_wav(samples16, rate=8000, channels=1):
    data = samples16.astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little") + rate.to_bytes(4, "little")
        + (rate * channels * 2).to_bytes(4, "little") + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


_A7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_filter_pass(flat, bpp, filters):
    """Forward-filter one (sub-)image (ph, pw*bpp byte rows) per the
    spec's byte-level transforms; ``filters`` cycles per row."""
    import numpy as np

    ph = flat.shape[0]
    raw = bytearray()
    prev = np.zeros(flat.shape[1], dtype=np.uint8)
    for y in range(ph):
        line = flat[y]
        f = filters[y % len(filters)]
        enc = np.array(line, dtype=np.uint8)
        if f == 1:
            enc[bpp:] = line[bpp:] - line[:-bpp]
        elif f == 2:
            enc = line - prev
        elif f == 3:
            a = np.concatenate([np.zeros(bpp, np.uint16), line[:-bpp].astype(np.uint16)])
            enc = line - ((a + prev.astype(np.uint16)) // 2).astype(np.uint8)
        elif f == 4:
            a = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp].astype(np.int16)])
            b = prev.astype(np.int16)
            c = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp].astype(np.int16)])
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            enc = line - pred.astype(np.uint8)
        raw += bytes([f]) + enc.tobytes()
        prev = line
    return raw


def _make_png(arr, filters=None, palette=None, interlace=0):
    """Independent minimal PNG encoder (struct + zlib, not decode_png):
    ``arr`` is (h, w) gray, (h, w, c) for RGB/RGBA, or (h, w) palette
    indices when ``palette`` is given; dtype uint16 produces a 16-bit
    image. ``filters``: per-row filter type (default 0), applying the
    spec's filter transforms forward. ``interlace=1``: Adam7 — each
    pass extracted on the spec grid and filtered independently."""
    import struct
    import zlib

    import numpy as np

    h, w = arr.shape[:2]
    depth = 16 if arr.dtype == np.uint16 else 8
    if palette is not None:
        ctype, channels = 3, 1
        flat = arr.reshape(h, w, 1)
    elif arr.ndim == 2:
        ctype, channels = 0, 1
        flat = arr.reshape(h, w, 1)
    else:
        channels = arr.shape[2]
        ctype = {3: 2, 4: 6, 2: 4}[channels]
        flat = arr
    bpp = channels * (depth // 8)
    filters = filters or [0]

    def to_bytes(img):  # (ph, pw, channels) -> (ph, pw*bpp) uint8
        ph, pw = img.shape[:2]
        if depth == 16:
            return np.frombuffer(img.astype(">u2").tobytes(), dtype=np.uint8).reshape(ph, pw * bpp)
        return img.reshape(ph, pw * channels).astype(np.uint8)

    raw = bytearray()
    if interlace == 0:
        raw += _png_filter_pass(to_bytes(flat), bpp, filters)
    else:
        for x0, y0, dx, dy in _A7:
            sub = flat[y0::dy, x0::dx, :]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += _png_filter_pass(to_bytes(sub), bpp, filters)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    return out


def test_png_roundtrip_all_filters():
    """decode_png must invert every scanline filter type on bytes an
    independent encoder produced (sub/up/average/paeth per row)."""
    import numpy as np

    from essentials_spark.multimodal.media import decode_png

    rng = np.random.RandomState(11)
    # RGB, one row per filter type + extras
    rgb = rng.randint(0, 256, size=(7, 9, 3), dtype=np.uint8)
    png = _make_png(rgb, filters=[0, 1, 2, 3, 4, 4, 3])
    assert np.array_equal(decode_png(png), rgb)

    # grayscale
    gray = rng.randint(0, 256, size=(5, 6), dtype=np.uint8)
    png = _make_png(gray, filters=[4, 3, 2, 1, 0])
    assert np.array_equal(decode_png(png), gray)

    # RGBA
    rgba = rng.randint(0, 256, size=(4, 4, 4), dtype=np.uint8)
    png = _make_png(rgba, filters=[2, 4, 1, 3])
    assert np.array_equal(decode_png(png), rgba)

    # palette
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(5, 5), dtype=np.uint8)
    png = _make_png(idx, filters=[0, 1, 2, 3, 4], palette=pal)
    assert np.array_equal(decode_png(png), pal[idx])

    # loud failures for unsupported variants: sub-byte depth
    import pytest as _pytest

    bad = bytearray(_make_png(gray))
    bad[8 + 8 + 8] = 4  # depth byte inside IHDR data -> 4-bit
    with _pytest.raises(NotImplementedError):
        decode_png(bytes(bad))


def test_png_16bit_roundtrip():
    """16-bit gray / RGB / RGBA: byte-level filters with bpp =
    channels*2 must reassemble exact big-endian uint16 samples."""
    import numpy as np

    from essentials_spark.multimodal.media import decode_png

    rng = np.random.RandomState(23)
    g16 = rng.randint(0, 65536, size=(6, 7), dtype=np.uint16)
    assert np.array_equal(decode_png(_make_png(g16, filters=[0, 1, 2, 3, 4])), g16)
    rgb16 = rng.randint(0, 65536, size=(5, 4, 3), dtype=np.uint16)
    out = decode_png(_make_png(rgb16, filters=[4, 3, 2, 1]))
    assert out.dtype == np.uint16 and np.array_equal(out, rgb16)
    rgba16 = rng.randint(0, 65536, size=(3, 9, 4), dtype=np.uint16)
    assert np.array_equal(decode_png(_make_png(rgba16, filters=[3, 4])), rgba16)


def test_png_adam7_roundtrip():
    """Adam7: 7 independently-filtered pass sub-images scattered onto
    the spec grid — exercised at sizes that hit empty passes (h or w
    < pass offsets) and all filter types within passes."""
    import numpy as np

    from essentials_spark.multimodal.media import decode_png

    rng = np.random.RandomState(31)
    for shape in [(16, 16, 3), (9, 13, 4), (3, 3), (1, 1), (2, 10, 3), (7, 7)]:
        arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
        png = _make_png(arr, filters=[0, 1, 2, 3, 4], interlace=1)
        assert np.array_equal(decode_png(png), arr), shape
    # 16-bit + Adam7 together
    a16 = rng.randint(0, 65536, size=(10, 11, 3), dtype=np.uint16)
    png = _make_png(a16, filters=[4, 2, 3, 1], interlace=1)
    assert np.array_equal(decode_png(png), a16)
    # palette + Adam7
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(9, 6), dtype=np.uint8)
    png = _make_png(idx, filters=[1, 0, 2], palette=pal, interlace=1)
    assert np.array_equal(decode_png(png), pal[idx])


def test_real_codecs_roundtrip():
    """The pure-NumPy codecs must decode bytes they didn't produce
    themselves back to the exact pixel/sample values."""
    import numpy as np

    from essentials_spark.multimodal.media import decode_bmp, decode_ppm, decode_wav

    ppm_bytes, arr = _make_ppm(5, 3, lambda y, x, c: (y * 50 + x * 10 + c) % 256)
    assert np.array_equal(decode_ppm(ppm_bytes), arr)

    bmp_bytes, rgb = _make_bmp(5, 3, lambda y, x, c: (y * 40 + x * 7 + c * 3) % 256)
    assert np.array_equal(decode_bmp(bmp_bytes), rgb)

    s = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    samples, rate = decode_wav(_make_wav(s, rate=16000))
    assert rate == 16000 and len(samples) == 400
    assert np.allclose(samples, s / 32768.0)
    # stereo averages to mono
    stereo = np.stack([s, -s], axis=1).ravel()
    mono, _ = decode_wav(_make_wav(stereo, channels=2))
    assert np.allclose(mono, 0.0)


def test_real_codecs_through_spark_pipeline(spark):
    """Real PPM/WAV payloads through the mapInPandas decode stages:
    features must reflect the DECODED content, not byte stats."""
    import numpy as np

    from essentials_spark.multimodal.media import decode_audio, decode_images

    ppm_bytes, arr = _make_ppm(8, 4, lambda y, x, c: (x * 30) % 256)
    s = (np.ones(1000) * 16384).astype(np.int16)
    wav_bytes = _make_wav(s, rate=8000)
    rows = [
        (1, "image", bytearray(ppm_bytes), "image/x-portable-pixmap", 8, 4, 0),
        (2, "audio", bytearray(wav_bytes), "audio/wav", 0, 0, 125),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, width int, height int, duration_ms int"
    )
    img = decode_images(media, batch_features=4).collect()
    assert len(img) == 1 and img[0]["media_id"] == 1
    # grayscale mean of the decoded image == mean over constructed pixels
    expected_mean = arr.mean(axis=2).mean()
    assert abs(float(np.mean(img[0]["feature"])) - expected_mean) < 1.0

    aud = decode_audio(media, batch_features=4).collect()
    assert len(aud) == 1 and aud[0]["n_samples"] == 1000 and aud[0]["sample_rate"] == 8000
    assert abs(aud[0]["rms"] - 0.5) < 1e-3  # constant half-scale signal


def test_compressed_media_raises_loudly():
    from essentials_spark.multimodal.media import _decode_payload

    import pytest as _pytest

    # JPEG still requires PIL — loud NotImplementedError, never the fake
    with _pytest.raises(NotImplementedError):
        _decode_payload(b"\xff\xd8\xff\xe0" + b"\0" * 100, 8, 8)
    # PNG decodes natively now; a truncated/garbage PNG is a loud
    # ValueError (corrupt data), not a silent fall-through to the fake
    with _pytest.raises(ValueError):
        _decode_payload(b"\x89PNG\r\n\x1a\n" + b"\0" * 100, 8, 8)


def test_ann_ivf_recall_and_training(spark):
    """IVF coarse quantizer: planted near-duplicates share the query's
    Voronoi cell, so nprobe search finds them; Lloyd-trained codebook
    keeps (or improves) recall and still returns a valid top-k."""
    from essentials_spark.ann.cosine import brute_force_topk, ivf_topk

    rng = np.random.RandomState(5)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    for q in range(3):
        base[q + 30] = base[q] + 0.01 * rng.standard_normal(16).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(40)], "vec_id long, embedding array<float>"
    )
    q = df.filter(F.col("vec_id") < 3)
    exact = {r["query_id"]: r["neighbor_id"] for r in brute_force_topk(q, df, k=1).collect()}

    approx = ivf_topk(q, df, k=1, n_cells=8, nprobe=3, dim=16).collect()
    hits = sum(1 for r in approx if exact.get(r["query_id"]) == r["neighbor_id"])
    assert hits >= 2  # near-dup lands in the query's cell

    trained = ivf_topk(q, df, k=1, n_cells=8, nprobe=3, dim=16, train_iters=2).collect()
    t_hits = sum(1 for r in trained if exact.get(r["query_id"]) == r["neighbor_id"])
    assert t_hits >= 2
    assert all(r["rank"] == 1 for r in trained)


def test_curate_corpus_stage_reasons(spark):
    """Composite curation pipeline: each planted document drops at the
    expected stage, the survivor set is exact."""
    from essentials_spark.text.curate import curate_corpus

    good = (
        "the quick brown fox jumps over a lazy dog and then runs off to "
        "the meadow where birds sing and children play games all day"
    )
    rows = [
        (0, good),                       # kept
        (1, good),                       # exact dup of 0
        (2, good.replace("lazy", "sleepy")),  # near dup of 0
        (3, "el perro y el gato de la casa que ladra y corre mucho por "
            "la calle grande durante todo el dia sin parar nunca jamas"),  # lang
        (4, "tiny"),                     # quality (n_tokens < 5 -> 0.0)
        (5, "numbers and facts of the data and the code to test a "
            "pipeline with many unique different interesting useful words here"),  # kept
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["kept"], r["reason"]) for r in
           curate_corpus(docs, min_quality=0.3, langs=("en",), min_sim=0.4).collect()}
    assert out[0] == (True, None)
    assert out[1] == (False, "exact_dup")
    assert out[2] == (False, "near_dup")
    assert out[3] == (False, "lang")
    assert out[4] == (False, "quality")
    assert out[5] == (True, None)


def test_bm25_hand_computed(spark):
    """Two-doc corpus, hand-checked BM25 (k1=1.2, b=0.75)."""
    import math

    from essentials_spark.text.rank import bm25_scores

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry date fig")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["apple", "cherry"]).collect()}
    N, avgdl = 3, (3 + 2 + 3) / 3
    k1, b = 1.2, 0.75

    def idf(df):
        return math.log((N - df + 0.5) / (df + 0.5) + 1)

    def term(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp = {
        1: idf(1) * term(2, 3),                       # apple x2
        2: idf(2) * term(1, 2),                       # cherry
        3: idf(2) * term(1, 3),                       # cherry
    }
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-12


def test_kmeans_separated_clusters(spark):
    """Three well-separated blobs: k-means with k=3 recovers them
    exactly regardless of seeding, and kmeans_cost's WCSS is tiny
    within blobs."""
    import numpy as np

    from essentials_spark.ann.kmeans import kmeans, kmeans_cost

    rng = np.random.RandomState(3)
    centers = np.array([[10.0, 0.0], [0.0, 10.0], [-10.0, -10.0]])
    rows = []
    for i in range(60):
        c = i % 3
        v = centers[c] + rng.normal(0, 0.1, 2)
        rows.append((i, [float(v[0]), float(v[1])]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans(emb, k=3, iters=4)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    # same blob -> same cluster, different blobs -> different clusters
    for i in range(60):
        assert got[i] == got[i % 3], (i, got[i], got[i % 3])
    assert len({got[0], got[1], got[2]}) == 3
    cost = kmeans_cost(emb, out).collect()
    assert len(cost) == 3
    for r in cost:
        assert r["n"] == 20 and r["wcss"] < 2.0


def test_kmeans_deterministic(spark):
    import numpy as np

    from essentials_spark.ann.kmeans import kmeans

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, kmeans(emb, k=4, iters=2).collect()))
    b = sorted(map(tuple, kmeans(emb, k=4, iters=2).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# Deterministic sketches (ops/sketch.py)
# ---------------------------------------------------------------------------


def test_linear_count_accuracy_and_determinism(spark):
    from essentials_spark.ops.sketch import linear_count

    df = spark.range(3000).select(F.col("id").alias("k"))
    r1 = linear_count(df, "k", m=4096).collect()[0]
    assert abs(r1.estimate - 3000) / 3000 < 0.05  # ~2% expected error at t≈0.73
    # pure function of the input SET: layout-independent
    r2 = linear_count(df.repartition(13), "k", m=4096).collect()[0]
    assert (r1.occupied, r1.estimate) == (r2.occupied, r2.estimate)
    # duplicates don't change the estimate (cardinality, not count)
    r3 = linear_count(df.union(df), "k", m=4096).collect()[0]
    assert r3.estimate == r1.estimate


def test_linear_count_edges(spark):
    from essentials_spark.ops.sketch import linear_count

    empty = spark.createDataFrame([], "k long")
    assert linear_count(empty, "k", m=64).collect()[0].estimate == 0
    # saturation: more distincts than buckets -> every bucket occupied
    big = spark.range(5000).select(F.col("id").alias("k"))
    assert linear_count(big, "k", m=16).collect()[0].estimate == -1


def test_count_min_overestimates_never_under(spark):
    from essentials_spark.ops.sketch import count_min_query, count_min_table

    rows = [(f"w{i % 50}",) for i in range(2000)] + [("rare",)]
    df = spark.createDataFrame(rows, "token string")
    true = {r.token: r.c for r in df.groupBy("token").agg(F.count("*").alias("c")).collect()}
    table = count_min_table(df, "token", depth=4, width=64)
    est = {
        r.token: r.est
        for r in count_min_query(table, df, "token", depth=4, width=64).collect()
    }
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)  # conservative property
    # wide table, few keys: no collisions -> exact
    wide = count_min_table(df, "token", depth=4, width=4096)
    est_w = {
        r.token: r.est
        for r in count_min_query(wide, df, "token", depth=4, width=4096).collect()
    }
    assert est_w == true


def test_count_min_is_a_monoid(spark):
    # cell-wise ADDITION of two batch tables == table of the union —
    # the property that makes the sketch incremental/streaming-safe
    from essentials_spark.ops.sketch import count_min_table

    a = spark.createDataFrame([(f"x{i % 7}",) for i in range(100)], "token string")
    b = spark.createDataFrame([(f"x{i % 11}",) for i in range(80)], "token string")
    merged = (
        count_min_table(a, "token", depth=2, width=32)
        .unionByName(count_min_table(b, "token", depth=2, width=32))
        .groupBy("d", "b")
        .agg(F.sum("c").alias("c"))
    )
    whole = count_min_table(a.union(b), "token", depth=2, width=32)
    diff = merged.join(whole, ["d", "b"], "full").filter(
        F.coalesce(merged["c"], F.lit(0)) != F.coalesce(whole["c"], F.lit(0))
    )
    assert diff.count() == 0


def test_bounded_quantiles_exact(spark):
    from essentials_spark.ops.quantiles import bounded_quantiles

    # values 1..100 once each: decile d = smallest v with cum >= 10d
    df = spark.range(1, 101).select(F.col("id").alias("v"))
    got = {r.pct_ppm: r.value for r in bounded_quantiles(df, "v").collect()}
    assert got == {d * 100_000: d * 10 for d in range(1, 10)}
    # skewed multiplicities: 90x value 7, 10x value 99
    sk = spark.createDataFrame([(7,)] * 90 + [(99,)] * 10, "v long")
    g2 = {r.pct_ppm: r.value for r in bounded_quantiles(sk, "v").collect()}
    assert g2[900_000] == 7 and g2 == {d * 100_000: (7 if d <= 9 else 99) for d in range(1, 10)}
    # p100 = max; NULLs excluded from n
    withnull = spark.createDataFrame([(1,), (None,), (5,)], "v long")
    top = bounded_quantiles(withnull, "v", quantiles_ppm=(1_000_000,)).collect()
    assert (top[0].pct_ppm, top[0].value) == (1_000_000, 5)
