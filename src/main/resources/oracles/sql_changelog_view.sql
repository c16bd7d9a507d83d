-- oracle for sql_changelog_view: replay the (v1, current] changelog in
-- set SQL. v2 dropped the 1995-01 partition (all its rows -> delete);
-- v3 appended 1995-04 (all its rows -> insert); 1995-02/03 untouched.
WITH b AS (
  SELECT o_orderkey,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month
  FROM orders WHERE o_orderkey % 4 < 2),
feed AS (
  SELECT 'delete' AS change_type, month, o_orderkey
  FROM b WHERE month = '1995-01'
  UNION ALL
  SELECT 'insert', month, o_orderkey FROM b WHERE month = '1995-04')
SELECT change_type, month, count(*) AS n_changes,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM feed GROUP BY 1, 2 ORDER BY 1, 2
