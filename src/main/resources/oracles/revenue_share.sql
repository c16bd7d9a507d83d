WITH ps AS (
  SELECT o_orderstatus,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS status_cents
  FROM orders GROUP BY o_orderstatus),
g AS (SELECT CAST(sum(status_cents) AS BIGINT) AS grand_cents FROM ps)
SELECT o_orderstatus, status_cents,
       CAST((status_cents * 10000) // grand_cents AS BIGINT) AS share_bps
FROM ps, g ORDER BY o_orderstatus