WITH w(g, wt) AS (VALUES
       ('src0', CAST(0.5 AS DOUBLE)), ('src1', CAST(0.25 AS DOUBLE)),
       ('src2', CAST(0.125 AS DOUBLE)), ('src3', CAST(0.125 AS DOUBLE))),
d AS (SELECT doc_id, source, wt,
             md5(CAST(doc_id AS VARCHAR) || ':mix1') AS key
      FROM documents JOIN w ON source = g),
t AS (SELECT source,
             CAST(floor(min(CAST(ng AS DOUBLE) / wt) OVER () * wt) AS BIGINT) AS target
      FROM (SELECT source, wt, count(*) AS ng FROM d GROUP BY 1, 2)),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS mix_rank
      FROM d)
SELECT r.doc_id, r.source, mix_rank FROM r JOIN t USING (source)
WHERE mix_rank <= target ORDER BY doc_id