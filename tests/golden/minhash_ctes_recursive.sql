
    WITH RECURSIVE t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1), i -> toks[i+0] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s FROM t
    ),
    sig AS (
        SELECT doc_id, MIN((h1 + 0 * h2) % 4294967296) AS h0,
               MIN((h1 + 1 * h2) % 4294967296) AS h1,
               MIN((h1 + 2 * h2) % 4294967296) AS h2,
               MIN((h1 + 3 * h2) % 4294967296) AS h3,
               MIN((h1 + 4 * h2) % 4294967296) AS h4,
               MIN((h1 + 5 * h2) % 4294967296) AS h5,
               MIN((h1 + 6 * h2) % 4294967296) AS h6,
               MIN((h1 + 7 * h2) % 4294967296) AS h7,
               MIN((h1 + 8 * h2) % 4294967296) AS h8,
               MIN((h1 + 9 * h2) % 4294967296) AS h9,
               MIN((h1 + 10 * h2) % 4294967296) AS h10,
               MIN((h1 + 11 * h2) % 4294967296) AS h11,
               MIN((h1 + 12 * h2) % 4294967296) AS h12,
               MIN((h1 + 13 * h2) % 4294967296) AS h13,
               MIN((h1 + 14 * h2) % 4294967296) AS h14,
               MIN((h1 + 15 * h2) % 4294967296) AS h15
        FROM (
        SELECT doc_id,
               CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT) AS h1,
               CAST(('0x' || substring(md5(s), 9, 8)) AS BIGINT) AS h2
        FROM sh) GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_id, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bh FROM sig
        UNION ALL SELECT doc_id, 1 AS band_id, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bh FROM sig
        UNION ALL SELECT doc_id, 2 AS band_id, md5(h8 || '|' || h9 || '|' || h10 || '|' || h11) AS bh FROM sig
        UNION ALL SELECT doc_id, 3 AS band_id, md5(h12 || '|' || h13 || '|' || h14 || '|' || h15) AS bh FROM sig
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id
    )