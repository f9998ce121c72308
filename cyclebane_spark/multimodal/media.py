"""Multimodal columns: images/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so *decode* is stubbed behind a
deterministic fake format (``FAKEIMG1``/``FAKEAUD1``/``FAKEVID1`` headers —
see :func:`fake_image`); everything Spark-side is real and tested: schemas,
binary handling through Arrow, UDF signatures, iterator batch shape,
partition-parallel execution. Swapping the stub for PIL/ffmpeg changes only
the inner numpy block.

Scale: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory);
nothing ever collects to the driver. Feature extraction is embarrassingly
parallel; downstream joins happen on the extracted metadata, never on the
binary itself.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

IMG_MAGIC = b'FAKEIMG1'
AUD_MAGIC = b'FAKEAUD1'
VID_MAGIC = b'FAKEVID1'
SCV_MAGIC = b'FAKESCV1'
VAD_MAGIC = b'FAKEVAD1'

IMAGE_META_SCHEMA = 'mime string, width int, height int, n_bytes int'
DECODED_SCHEMA = 'doc_id long, width int, height int, mean_intensity double'
RESIZED_SCHEMA = 'doc_id long, width int, height int, pixels array<double>'
FRAME_SCHEMA = 'doc_id long, frame_idx int, frame_mean double'
SCENE_CUT_SCHEMA = 'doc_id long, cut_idx int, frame_dist double'
VAD_SCHEMA = 'doc_id long, start_frame int, end_frame int'
AUDIO_FEATURES_SCHEMA = (
    'doc_id long, sample_rate int, n_samples int, rms double, zero_crossings int'
)


# -- deterministic fake payload builders (stand-ins for real codecs) ---------


def fake_image(width: int, height: int, seed: int) -> bytes:
    return IMG_MAGIC + struct.pack('<iiq', width, height, seed)


def fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    return AUD_MAGIC + struct.pack('<iiq', sample_rate, n_samples, seed)


def fake_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    return VID_MAGIC + struct.pack('<iiiq', width, height, n_frames, seed)


def fake_scene_video(
    width: int, height: int, n_frames: int, scene_len: int, seed: int
) -> bytes:
    """A scene-structured stub video: frames within one scene decode to
    IDENTICAL pixels (frame seed = seed + scene index), so consecutive
    frames differ exactly at scene boundaries — what a real codec's
    I-frame boundaries look like to a pixel-difference detector."""
    return SCV_MAGIC + struct.pack(
        '<iiiiq', width, height, n_frames, scene_len, seed
    )


def fake_vad_audio(
    sample_rate: int, seg_frames: int, n_segments: int, seed: int
) -> bytes:
    """Speech/silence-segmented stub audio: segment i decodes to uniform
    [-1,1) samples when i's parity matches seed's, digital silence
    otherwise — what an energy-based voice-activity detector sees at
    speech boundaries. Segment length is seg_frames 64-sample frames."""
    return VAD_MAGIC + struct.pack(
        '<iiiq', sample_rate, seg_frames, n_segments, seed
    )


def _pixels(width: int, height: int, seed: int) -> np.ndarray:
    """The stub 'decoder': deterministic pixels from the payload seed."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.random((height, width), dtype=np.float64)


def with_fake_images(docs: DataFrame) -> DataFrame:
    """Attach a deterministic fake image column to the documents table.

    Width/height derive from stable document properties so every run (and
    every engine) builds identical payloads.
    """
    @F.pandas_udf('binary')
    def build(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        return pd.Series(
            [
                fake_image(16 + int(n) % 17, 16 + int(d) % 13, int(d))
                for d, n in zip(doc_id, n_chars)
            ]
        )

    return docs.withColumn('image', build('doc_id', 'n_chars'))


def with_fake_videos(docs: DataFrame) -> DataFrame:
    """Deterministic fake video column: frame count derives from doc_id."""

    @F.pandas_udf('binary')
    def build(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        return pd.Series(
            [
                fake_video(
                    16 + int(n) % 9, 16 + int(d) % 7, 4 + int(d) % 5, int(d)
                )
                for d, n in zip(doc_id, n_chars)
            ]
        )

    return docs.withColumn('video', build('doc_id', 'n_chars'))


def with_fake_audio(docs: DataFrame) -> DataFrame:
    """Deterministic fake audio column: rate/length derive from doc fields."""

    @F.pandas_udf('binary')
    def build(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        return pd.Series(
            [
                fake_audio(
                    8000 + (int(d) % 3) * 4000, 256 + int(n) % 100, int(d)
                )
                for d, n in zip(doc_id, n_chars)
            ]
        )

    return docs.withColumn('audio', build('doc_id', 'n_chars'))


# -- operators ----------------------------------------------------------------


def image_metadata(df: DataFrame, col: str = 'image') -> DataFrame:
    """Parse typed metadata out of the binary payload (header only — cheap)."""

    @F.pandas_udf(IMAGE_META_SCHEMA)
    def meta(payload: pd.Series) -> pd.DataFrame:
        rows = []
        for b in payload:
            if b is not None and bytes(b[:8]) == IMG_MAGIC:
                w, h, _ = struct.unpack('<iiq', bytes(b[8:24]))
                rows.append(('image/x-fake', w, h, len(b)))
            else:
                rows.append((None, None, None, len(b) if b is not None else None))
        return pd.DataFrame(
            rows, columns=['mime', 'width', 'height', 'n_bytes']
        )

    return df.withColumn('image_meta', meta(F.col(col)))


def decode_images(df: DataFrame, col: str = 'image') -> DataFrame:
    """Decode payloads to per-image statistics via mapInPandas.

    Iterator-of-batches signature: one Arrow batch in, one out; the decoded
    pixel array never leaves the executor. Unknown formats raise
    NotImplementedError — the marker for where PIL/libjpeg would plug in.
    """
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, b in zip(pdf['doc_id'], pdf[col]):
                b = bytes(b)
                if b[:8] != IMG_MAGIC:
                    raise NotImplementedError(
                        'real image decoding requires PIL; payload is not FAKEIMG1'
                    )
                w, h, seed = struct.unpack('<iiq', b[8:24])
                px = _pixels(w, h, seed)
                out.append((doc_id, w, h, float(px.mean())))
            yield pd.DataFrame(
                out, columns=['doc_id', 'width', 'height', 'mean_intensity']
            )

    return df.select('doc_id', col).mapInPandas(decode, DECODED_SCHEMA)


def resize_images(
    df: DataFrame, out_w: int = 4, out_h: int = 4, col: str = 'image'
) -> DataFrame:
    """Decode + block-average resize to (out_w x out_h); emits pixel arrays."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf['doc_id'], pdf[col]):
                b = bytes(b)
                if b[:8] != IMG_MAGIC:
                    raise NotImplementedError('unsupported image format')
                w, h, seed = struct.unpack('<iiq', b[8:24])
                px = _pixels(w, h, seed)
                ys = np.linspace(0, h, out_h + 1).astype(int)
                xs = np.linspace(0, w, out_w + 1).astype(int)
                small = [
                    float(px[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean())
                    for i in range(out_h)
                    for j in range(out_w)
                ]
                rows.append((doc_id, out_w, out_h, small))
            yield pd.DataFrame(
                rows, columns=['doc_id', 'width', 'height', 'pixels']
            )

    return df.select('doc_id', col).mapInPandas(resize, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, every_n: int = 2, col: str = 'video'
) -> DataFrame:
    """Frame sampling: one output row per kept frame (fan-out in pandas)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf['doc_id'], pdf[col]):
                b = bytes(b)
                if b[:8] != VID_MAGIC:
                    raise NotImplementedError('unsupported video format')
                w, h, n_frames, seed = struct.unpack('<iiiq', b[8:28])
                for idx in range(0, n_frames, every_n):
                    px = _pixels(w, h, seed + idx)
                    rows.append((doc_id, idx, float(px.mean())))
            yield pd.DataFrame(
                rows, columns=['doc_id', 'frame_idx', 'frame_mean']
            )

    return df.select('doc_id', col).mapInPandas(sample, FRAME_SCHEMA)


def with_fake_scene_videos(docs: DataFrame) -> DataFrame:
    """Deterministic scene-structured video column; frame count and scene
    length derive from doc fields so the cut skeleton has a relational
    oracle."""

    @F.pandas_udf('binary')
    def build(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        return pd.Series(
            [
                fake_scene_video(
                    16 + int(n) % 9,
                    16 + int(d) % 7,
                    6 + int(d) % 7,
                    2 + int(d) % 3,
                    int(d),
                )
                for d, n in zip(doc_id, n_chars)
            ]
        )

    return docs.withColumn('video', build('doc_id', 'n_chars'))


def scene_cuts(
    df: DataFrame, threshold: float = 0.01, col: str = 'video'
) -> DataFrame:
    """Scene-change detection: decode consecutive frames, emit one row per
    cut (mean |pixel delta| > threshold). The detector is structure-
    agnostic — it thresholds measured frame distances; it does not read
    the scene length from the header. Fan-out per Arrow batch on the
    executors, no shuffle."""

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf['doc_id'], pdf[col]):
                b = bytes(b)
                if b[:8] != SCV_MAGIC:
                    raise NotImplementedError('unsupported video format')
                w, h, n_frames, scene_len, seed = struct.unpack(
                    '<iiiiq', b[8:32]
                )
                prev = _pixels(w, h, seed)
                for idx in range(1, n_frames):
                    cur = _pixels(w, h, seed + idx // scene_len)
                    dist = float(np.abs(cur - prev).mean())
                    if dist > threshold:
                        rows.append((doc_id, idx, dist))
                    prev = cur
            yield pd.DataFrame(
                rows, columns=['doc_id', 'cut_idx', 'frame_dist']
            )

    return df.select('doc_id', col).mapInPandas(detect, SCENE_CUT_SCHEMA)


def with_fake_vad_audio(docs: DataFrame) -> DataFrame:
    """Deterministic segmented audio column; segment geometry derives from
    doc fields so the speech-run skeleton has a relational oracle."""

    @F.pandas_udf('binary')
    def build(doc_id: pd.Series, n_chars: pd.Series) -> pd.Series:
        return pd.Series(
            [
                fake_vad_audio(
                    8000 + (int(n) % 3) * 4000,
                    1 + int(d) % 3,
                    3 + int(d) % 4,
                    int(d),
                )
                for d, n in zip(doc_id, n_chars)
            ]
        )

    return docs.withColumn('audio', build('doc_id', 'n_chars'))


_VAD_FRAME = 64


def voice_activity(
    df: DataFrame, threshold: float = 0.01, col: str = 'audio'
) -> DataFrame:
    """Energy-based voice-activity detection: frame the samples into
    64-sample windows, threshold each frame's RMS, and merge consecutive
    active frames into speech runs — one output row per run. The detector
    is structure-agnostic (it thresholds measured energy; it never reads
    segment positions from the header). Per-Arrow-batch fan-out, zero
    shuffle."""

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf['doc_id'], pdf[col]):
                b = bytes(b)
                if b[:8] != VAD_MAGIC:
                    raise NotImplementedError('unsupported audio format')
                rate, seg_frames, n_segments, seed = struct.unpack(
                    '<iiiq', b[8:28]
                )
                seg_len = seg_frames * _VAD_FRAME
                samples = np.concatenate(
                    [
                        (
                            np.random.Generator(
                                np.random.PCG64(seed + i)
                            ).random(seg_len)
                            * 2.0
                            - 1.0
                            if i % 2 == seed % 2
                            else np.zeros(seg_len)
                        )
                        for i in range(n_segments)
                    ]
                )
                frames = samples.reshape(-1, _VAD_FRAME)
                rms = np.sqrt((frames**2).mean(axis=1))
                active = rms > threshold
                start = None
                for idx, a in enumerate(active):
                    if a and start is None:
                        start = idx
                    elif not a and start is not None:
                        rows.append((doc_id, start, idx - 1))
                        start = None
                if start is not None:
                    rows.append((doc_id, start, len(active) - 1))
            yield pd.DataFrame(
                rows, columns=['doc_id', 'start_frame', 'end_frame']
            )

    return df.select('doc_id', col).mapInPandas(detect, VAD_SCHEMA)


def audio_features(df: DataFrame, col: str = 'audio') -> DataFrame:
    """Waveform features (rms, zero crossings) from the fake audio payload."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf['doc_id'], pdf[col]):
                b = bytes(b)
                if b[:8] != AUD_MAGIC:
                    raise NotImplementedError('unsupported audio format')
                rate, n, seed = struct.unpack('<iiq', b[8:24])
                rng = np.random.Generator(np.random.PCG64(seed))
                wave = rng.standard_normal(n)
                rms = float(np.sqrt((wave * wave).mean()))
                zc = int(((wave[:-1] * wave[1:]) < 0).sum())
                rows.append((doc_id, rate, n, rms, zc))
            yield pd.DataFrame(
                rows,
                columns=[
                    'doc_id', 'sample_rate', 'n_samples', 'rms', 'zero_crossings'
                ],
            )

    return df.select('doc_id', col).mapInPandas(features, AUDIO_FEATURES_SCHEMA)


def embed_images(df: DataFrame, col: str = 'image', dim: int = 8) -> DataFrame:
    """Image-encoder plug point: payload bytes -> fixed-dim embedding.

    A real pipeline loads a vision tower (CLIP/SigLIP) here; this stub
    parses the actual binary header and derives an integer embedding from
    it, so the Spark plumbing — binary column in, Arrow batch through a
    pandas UDF, ``array<bigint>`` out — is the production shape while the
    gate stays deterministic and relationally recomputable (the header
    fields derive from document columns; see multimodal_q.py's oracle).
    """

    @F.pandas_udf('array<long>')
    def embed(payload: pd.Series) -> pd.Series:
        out = []
        for b in payload:
            b = bytes(b)
            if b[:8] != IMG_MAGIC:
                raise NotImplementedError('unsupported image format')
            w, h, seed = struct.unpack('<iiq', b[8:24])
            out.append(
                [(seed * (i + 1) + w * (i + 2) + h * (i + 3)) % 997
                 for i in range(dim)]
            )
        return pd.Series(out)

    return df.withColumn('image_emb', embed(F.col(col)))


# -- perceptual hashing over "re-encoded photo" variants ---------------------
#
# NSY payloads model the phash use case: the SAME underlying photo saved
# several times with different encoder settings. Base pixels derive from a
# content-group seed (documents sharing it hold the same photo); a small
# per-doc noise field (amplitude NSY_NOISE_AMP, seeded by the doc) stands in
# for re-encode jitter. aHash then maps each image to 64 bits such that
# variants of one photo land a few bits apart and unrelated photos ~32 bits
# apart — the separation the hamming-band join in multimodal_q.py exploits.

NSY_MAGIC = b'FAKENSY1'
NSY_NOISE_AMP = 0.01
PHASH_SCHEMA = 'doc_id long, phash long'
_U64 = (1 << 64) - 1


def fake_noisy_image(
    width: int, height: int, base_seed: int, noise_seed: int
) -> bytes:
    return NSY_MAGIC + struct.pack(
        '<iiqq', width, height, base_seed, noise_seed
    )


def with_fake_photo_variants(docs: DataFrame, base_col: str) -> DataFrame:
    """Attach a 32x32 noisy-variant photo; ``base_col`` (int64) is the
    content-group seed — equal values mean 'same underlying photo'."""

    @F.pandas_udf('binary')
    def build(doc_id: pd.Series, base: pd.Series) -> pd.Series:
        return pd.Series(
            [
                fake_noisy_image(32, 32, int(b), int(d))
                for d, b in zip(doc_id, base)
            ]
        )

    return docs.withColumn('image', build('doc_id', base_col))


def ahash64_images(df: DataFrame, col: str = 'image') -> DataFrame:
    """Decode + 8x8 block-average aHash -> one int64 per image.

    Bit i is set iff block i's mean exceeds the whole image's mean. One
    mapInPandas pass; pixels never leave the executor batch — only the
    8-byte hash does. Swapping the stub decode for a real one (PIL +
    grayscale + resize) changes only the first two lines of the loop.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, b in zip(pdf['doc_id'], pdf[col]):
                b = bytes(b)
                if b[:8] != NSY_MAGIC:
                    raise NotImplementedError('unsupported image format')
                w, h, base_seed, noise_seed = struct.unpack('<iiqq', b[8:32])
                noise = np.random.Generator(np.random.PCG64(noise_seed))
                px = _pixels(w, h, base_seed & _U64) + NSY_NOISE_AMP * (
                    noise.random((h, w)) - 0.5
                )
                blocks = px.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
                bits = (blocks > px.mean()).flatten()
                v = int(np.packbits(bits, bitorder='little').view('<u8')[0])
                rows.append((int(d), v - (1 << 64) if v >= (1 << 63) else v))
            yield pd.DataFrame(rows, columns=['doc_id', 'phash'])

    return df.select('doc_id', col).mapInPandas(extract, PHASH_SCHEMA)
