"""Multimodal queries for the correctness gate.

The fake payload generator derives image dimensions from stable document
fields, so the metadata-extraction pipeline (build binary -> parse binary in
a pandas UDF) has a real SQL oracle: the oracle recomputes the dimensions
relationally while Spark recovers them by actually parsing the bytes.
Decode statistics (numpy inside mapInPandas) are not SQL-expressible and
register as a rows-only check.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..multimodal.media import decode_images, image_metadata, with_fake_images
from ..tables import table
from . import register


@register(
    'multimodal_image_metadata',
    oracle="""
    SELECT doc_id,
           'image/x-fake' AS mime,
           CAST(16 + n_chars % 17 AS INT) AS width,
           CAST(16 + doc_id % 13 AS INT) AS height,
           24 AS n_bytes
    FROM documents
    """,
)
def multimodal_image_metadata(spark, sf_dir):
    """binary-column round trip: build payloads, parse them back via UDF."""
    docs = table(spark, sf_dir, 'documents')
    out = image_metadata(with_fake_images(docs))
    return out.select(
        'doc_id',
        F.col('image_meta.mime').alias('mime'),
        F.col('image_meta.width').alias('width'),
        F.col('image_meta.height').alias('height'),
        F.col('image_meta.n_bytes').alias('n_bytes'),
    )


@register('multimodal_decode_stats')  # numpy decode: rows-only check
def multimodal_decode_stats(spark, sf_dir):
    """Full decode path through mapInPandas (deterministic stub decoder)."""
    docs = table(spark, sf_dir, 'documents')
    return decode_images(with_fake_images(docs))
