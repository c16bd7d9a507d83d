-- oracle for sql_agg_meta_trunc: the statement door answers this
-- COUNT/MIN/MAX/SUM/AVG over a truncate(2, o_orderpriority)-
-- partitioned table from the per-file _stats sidecars (the prefix
-- predicate decides every partition — '2-'/'3-' fully inside
-- ['2','4'), the rest fully outside; StatsAggSpec pins the
-- zero-data-I/O plan and the straddle bail); DuckDB recomputes from
-- the raw rows. Prices cast to DECIMAL(18,2) on both sides,
-- aggregates back to DOUBLE; the mean is one exact-sum double
-- division, the fold's own arithmetic.
WITH b AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
  FROM orders)
SELECT count(*) AS n_rows,
       CAST(min(o_totalprice) AS DOUBLE) AS min_price,
       CAST(max(o_totalprice) AS DOUBLE) AS max_price,
       CAST(sum(o_totalprice) AS DOUBLE) AS total,
       CAST(sum(o_orderkey) AS DOUBLE) / count(o_orderkey) AS mean_key
FROM b
WHERE o_orderpriority >= '2' AND o_orderpriority < '4'
