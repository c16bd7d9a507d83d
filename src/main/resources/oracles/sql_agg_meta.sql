-- oracle for sql_agg_meta: the statement door answers this grouped
-- COUNT/MIN/MAX/SUM from the per-file _stats sidecars (zero data I/O —
-- StatsAggSpec pins the plan shape); DuckDB recomputes it the honest
-- way from the raw rows. The decimal total is cast to DOUBLE on both
-- sides (the engines' sum-of-decimal result widths differ).
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-06')
-- mean_key spelled as one exact-sum double division — the fold's own
-- arithmetic (and DuckDB's avg over BIGINT computes the same at these
-- magnitudes; the spelling keeps parity arithmetic, not
-- implementation-dependent)
SELECT month, count(*) AS n_rows, count(o_orderkey) AS n_keys,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       CAST(sum(o_totalprice) AS DOUBLE) AS total,
       CAST(sum(o_orderkey) AS DOUBLE) / count(o_orderkey) AS mean_key
FROM b
WHERE month BETWEEN '1995-02' AND '1995-05'
GROUP BY month
ORDER BY month
