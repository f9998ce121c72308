"""Multimodal plumbing tests: binary columns through Arrow, mapInPandas
batch shapes, determinism, and the stubbed-decode error surface."""

import pyspark.sql.functions as F
import pytest

from cyclebane_spark.multimodal.media import (
    audio_features,
    decode_images,
    fake_audio,
    fake_video,
    image_metadata,
    resize_images,
    sample_frames,
    with_fake_images,
)

SF_DIR = '/root/testdata/sf0.001'


@pytest.fixture(scope='module')
def docs(spark):
    return spark.read.parquet(f'{SF_DIR}/documents.parquet').limit(50)


@pytest.fixture(scope='module')
def with_images(docs):
    return with_fake_images(docs)


def test_image_metadata_schema_and_values(with_images):
    out = image_metadata(with_images)
    rows = out.select('doc_id', 'n_chars', 'image_meta.*').collect()
    assert len(rows) == 50
    for r in rows:
        assert r.mime == 'image/x-fake'
        assert r.width == 16 + r.n_chars % 17
        assert r.n_bytes == 8 + 16


def test_decode_deterministic_and_distributed(spark, with_images):
    a = {r.doc_id: r.mean_intensity for r in decode_images(with_images).collect()}
    # different partitioning must not change results
    b = {
        r.doc_id: r.mean_intensity
        for r in decode_images(with_images.repartition(7)).collect()
    }
    assert a == b
    assert all(0.0 < v < 1.0 for v in a.values())


def test_resize_shapes(with_images):
    rows = resize_images(with_images, out_w=3, out_h=2).collect()
    assert all(len(r.pixels) == 6 for r in rows)
    assert all(r.width == 3 and r.height == 2 for r in rows)


def test_decode_unknown_format_raises(spark):
    df = spark.createDataFrame([(1, bytearray(b'JPEGJUNK....'))], 'doc_id long, image binary')
    with pytest.raises(Exception, match='NotImplementedError|FAKEIMG1'):
        decode_images(df).collect()


def test_frame_sampling_fanout(spark):
    df = spark.createDataFrame(
        [(1, bytearray(fake_video(8, 8, 10, seed=42)))],
        'doc_id long, video binary',
    )
    rows = sample_frames(df, every_n=3).collect()
    assert [r.frame_idx for r in rows] == [0, 3, 6, 9]
    # frames differ (seed advances per frame)
    assert len({r.frame_mean for r in rows}) == 4


def test_audio_features(spark):
    df = spark.createDataFrame(
        [(1, bytearray(fake_audio(16000, 1600, seed=7)))],
        'doc_id long, audio binary',
    )
    r = audio_features(df).collect()[0]
    assert r.sample_rate == 16000
    assert r.n_samples == 1600
    assert 0.8 < r.rms < 1.2  # standard normal
    assert 0 < r.zero_crossings < 1600


def test_embed_images_matches_header_fields(spark):
    """The stub image encoder derives the embedding from the PARSED binary
    header; cross-check against an independent Python recomputation from
    the document fields the payload was built from."""
    from cyclebane_spark.multimodal.media import embed_images, with_fake_images
    from cyclebane_spark.tables import table

    docs = table(spark, '/root/testdata/sf0.001', 'documents').limit(20)
    rows = embed_images(with_fake_images(docs)).select(
        'doc_id', 'n_chars', 'image_emb'
    ).collect()
    assert rows
    for r in rows:
        w, h, seed = 16 + r.n_chars % 17, 16 + r.doc_id % 13, r.doc_id
        expect = [
            (seed * (i + 1) + w * (i + 2) + h * (i + 3)) % 997 for i in range(8)
        ]
        assert list(r.image_emb) == expect


def test_clip_filter_keep_matches_float_cosine(spark):
    """The integer threshold test (25*dot^2 >= 16*n1*n2, dot>0) must agree
    with the float cosine >= 0.8 it encodes, checked independently."""
    import math

    from cyclebane_spark.queries import queries

    rows = queries()['multimodal_clip_filter'](
        spark, '/root/testdata/sf0.001'
    ).collect()
    assert rows
    seen_keep = 0
    for r in rows:
        cos = r.dot / math.sqrt(r.img_norm2 * r.txt_norm2)
        assert r.keep == (cos >= 0.8 - 1e-12 and r.dot > 0)
        seen_keep += bool(r.keep)
    # threshold is discriminative on this corpus: both classes appear
    assert 0 < seen_keep < len(rows)


def test_ahash_variant_separation(spark):
    """The contract the banded hamming join relies on: same-photo variants
    (equal base seed, different noise seed) stay within the pigeonhole
    radius (6 bits); unrelated photos sit tens of bits apart."""
    from cyclebane_spark.multimodal.media import (
        ahash64_images,
        with_fake_photo_variants,
    )
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, 100 + (i % 4)) for i in range(40)], 'doc_id long, base long'
    )
    hashes = {
        r.doc_id: r.phash
        for r in ahash64_images(
            with_fake_photo_variants(docs, 'base')
        ).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count('1')

    for i in range(40):
        for j in range(i + 1, 40):
            h = ham(hashes[i], hashes[j])
            if i % 4 == j % 4:  # same photo, different encoder jitter
                # jitter diameter is usually <= 3 but has a measured tail
                # (one ham-4 pair at sf1); the verify radius is 6
                assert h <= 6, (i, j, h)
            else:  # unrelated photos
                assert h > 16, (i, j, h)


def test_ahash_deterministic(spark):
    """Equal payloads (base AND noise seed) give bit-identical hashes."""
    from cyclebane_spark.multimodal.media import (
        ahash64_images,
        with_fake_photo_variants,
    )

    docs = spark.createDataFrame(
        [(7, 42), (7, 42)], 'doc_id long, base long'
    )
    a, b = [
        r.phash
        for r in ahash64_images(
            with_fake_photo_variants(docs, 'base')
        ).collect()
    ]
    assert a == b


def test_scene_cut_distances_zero_within_scenes(spark):
    """Within a scene consecutive frames decode identically (distance
    exactly 0 — never emitted); at boundaries the distance is the mean
    |delta| of two independent uniform frames (~1/3, far above the 0.01
    threshold). Verified against a direct numpy recompute per video."""
    import numpy as np

    from cyclebane_spark.multimodal.media import (
        _pixels,
        scene_cuts,
        with_fake_scene_videos,
    )
    from cyclebane_spark.tables import table

    docs = table(spark, '/root/testdata/sf0.001', 'documents').limit(40)
    out = scene_cuts(with_fake_scene_videos(docs)).collect()
    rows = {(r.doc_id, r.cut_idx): r.frame_dist for r in out}
    meta = {r.doc_id: r.n_chars for r in docs.select('doc_id', 'n_chars').collect()}
    for d, n in meta.items():
        w, h = 16 + int(n) % 9, 16 + int(d) % 7
        n_frames, scene_len, seed = 6 + d % 7, 2 + d % 3, d
        for idx in range(1, n_frames):
            cur = _pixels(w, h, seed + idx // scene_len)
            prev = _pixels(w, h, seed + (idx - 1) // scene_len)
            dist = float(np.abs(cur - prev).mean())
            if idx % scene_len == 0:
                assert abs(rows[(d, idx)] - dist) < 1e-12
                assert dist > 0.2  # two independent frames: ~1/3
            else:
                assert dist == 0.0
                assert (d, idx) not in rows


def test_vad_energy_separation(spark):
    """Silence frames have RMS exactly 0 (never active); speech frames of
    >= 64 uniform samples have RMS ~ 1/sqrt(3), far above threshold —
    the runs must cover exactly the speech segments, merged per segment."""
    import numpy as np

    from cyclebane_spark.multimodal.media import (
        _VAD_FRAME,
        voice_activity,
        with_fake_vad_audio,
    )
    from cyclebane_spark.tables import table

    docs = table(spark, '/root/testdata/sf0.001', 'documents').limit(30)
    out = voice_activity(with_fake_vad_audio(docs)).collect()
    runs = {}
    for r in out:
        runs.setdefault(r.doc_id, []).append((r.start_frame, r.end_frame))
    for d in [r.doc_id for r in docs.select('doc_id').collect()]:
        sf, n_seg = 1 + d % 3, 3 + d % 4
        want = [
            (i * sf, (i + 1) * sf - 1)
            for i in range(n_seg)
            if i % 2 == d % 2
        ]
        assert sorted(runs.get(d, [])) == want, d
        # energy check on one speech segment
        i = d % 2
        seg = np.random.Generator(np.random.PCG64(d + i)).random(
            sf * _VAD_FRAME
        ) * 2.0 - 1.0
        rms = np.sqrt(
            (seg.reshape(-1, _VAD_FRAME) ** 2).mean(axis=1)
        )
        assert (rms > 0.4).all()

def test_ahash_jitter_diameter_has_margin_on_gate_corpus(spark):
    """Tail-excursion early warning (ADVICE r7): the phash verify radius
    (6) is exact only against the MEASURED jitter diameter (max hamming 4
    observed at sf1). Assert the max variant-pair hamming on the gate
    corpus stays <= radius - 2, so a creeping jitter tail is diagnosed
    here as 'diameter grew' BEFORE it silently crosses the radius and
    flips the oracle gate red."""
    import pyspark.sql.functions as F

    from cyclebane_spark.multimodal.media import (
        ahash64_images,
        with_fake_photo_variants,
    )
    from cyclebane_spark.queries.multimodal_q import _PHASH_RADIUS
    from cyclebane_spark.tables import table

    docs = table(spark, '/root/testdata/sf0.001', 'documents')
    pre = F.array_join(
        F.slice(F.split(F.lower(F.trim('text')), r'\s+'), 1, 4), ' '
    )
    seeded = docs.withColumn('base', F.xxhash64(pre))
    # ahash64_images emits only (doc_id, phash); join base back for the
    # ground-truth variant grouping
    ph = ahash64_images(with_fake_photo_variants(seeded, 'base')).join(
        seeded.select('doc_id', 'base'), 'doc_id'
    )
    a, b = ph.alias('a'), ph.alias('b')
    max_ham = (
        a.join(
            b,
            (F.col('a.base') == F.col('b.base'))
            & (F.col('a.doc_id') < F.col('b.doc_id')),
        )
        .select(
            F.bit_count(
                F.col('a.phash').bitwiseXOR(F.col('b.phash'))
            ).alias('h')
        )
        .agg(F.max('h'))
        .collect()[0][0]
    )
    assert max_ham is not None  # variant groups exist on the gate corpus
    assert max_ham <= _PHASH_RADIUS - 2, (
        f'variant jitter diameter {max_ham} ate the radius margin '
        f'(radius {_PHASH_RADIUS}) — re-measure the tail before the '
        'oracle gate goes red'
    )
