-- oracle for changefeed_incremental: the CDC-maintained downstream
-- aggregate must equal the batch aggregate over the source's FINAL
-- state — months 1995-01..02 promoted, then 02 rewritten (%10 keys
-- dropped, surviving %3 keys repriced +10%) and 03 appended. The
-- Spark side never reads the source downstream; it folds the
-- delivered insert/delete windows into the aggregate.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders),
final AS (
  SELECT month, p FROM b WHERE month = '1995-01'
  UNION ALL
  SELECT month,
         CASE WHEN o_orderkey % 3 = 0
              THEN CAST(round(p * CAST(1.1 AS DECIMAL(3,1)), 2)
                        AS DECIMAL(18,2))
              ELSE p END
  FROM b WHERE month = '1995-02' AND o_orderkey % 10 <> 0
  UNION ALL
  SELECT month, p FROM b WHERE month = '1995-03')
SELECT month, count(*) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS total_price
FROM final GROUP BY 1 ORDER BY 1
