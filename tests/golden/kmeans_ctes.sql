WITH e AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
               CAST(round(CAST(UNNEST(embedding) AS DOUBLE) * 16384) AS BIGINT) AS q
        FROM embeddings
    ),
    seed AS (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cl
        FROM (SELECT DISTINCT vec_id FROM e WHERE vec_id >= 5
              ORDER BY vec_id LIMIT 8)
    ),
    c0 AS (
        SELECT seed.cl, e.pos, e.q AS c
        FROM e JOIN seed ON e.vec_id = seed.vec_id
    ),
    a1 AS (
        SELECT vec_id, cl FROM (
            SELECT e.vec_id, c.cl,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY SUM((e.q - c.c) * (e.q - c.c)), c.cl
                   ) AS rk
            FROM e JOIN c0 c ON e.pos = c.pos
            WHERE e.vec_id >= 5
            GROUP BY e.vec_id, c.cl
        ) WHERE rk = 1
    ),
    c1 AS (
        SELECT a.cl, e.pos,
               CAST(floor(CAST(SUM(e.q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
        FROM e JOIN a1 a ON e.vec_id = a.vec_id
        GROUP BY a.cl, e.pos
    ),
    a2 AS (
        SELECT vec_id, cl FROM (
            SELECT e.vec_id, c.cl,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY SUM((e.q - c.c) * (e.q - c.c)), c.cl
                   ) AS rk
            FROM e JOIN c1 c ON e.pos = c.pos
            WHERE e.vec_id >= 5
            GROUP BY e.vec_id, c.cl
        ) WHERE rk = 1
    ),
    c2 AS (
        SELECT a.cl, e.pos,
               CAST(floor(CAST(SUM(e.q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
        FROM e JOIN a2 a ON e.vec_id = a.vec_id
        GROUP BY a.cl, e.pos
    ),
    af AS (
        SELECT vec_id, cl FROM (
            SELECT e.vec_id, c.cl,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY SUM((e.q - c.c) * (e.q - c.c)), c.cl
                   ) AS rk
            FROM e JOIN c2 c ON e.pos = c.pos
            WHERE e.vec_id >= 5
            GROUP BY e.vec_id, c.cl
        ) WHERE rk = 1
    )