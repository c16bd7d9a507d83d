-- oracle for versioned_changefeed: replay the two delivered CDC
-- windows with set SQL. Hop 1 (commit_version 1) bootstraps months
-- 1995-01..02 as inserts; hop 2 (commit_version 2) carries the
-- 1995-02 rewrite (keys %10 dropped -> delete; surviving %3 keys
-- repriced -> update; others rewritten identically -> unchanged,
-- excluded from the feed) and the 1995-03 inserts. A third,
-- caught-up hop contributes nothing.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderkey
  FROM orders),
feed AS (
  SELECT 'insert' AS change_type, 1 AS commit_version, o_orderkey
  FROM b WHERE month IN ('1995-01', '1995-02')
  UNION ALL
  SELECT 'delete', 2, o_orderkey
  FROM b WHERE month = '1995-02' AND o_orderkey % 10 = 0
  UNION ALL
  SELECT 'update', 2, o_orderkey
  FROM b WHERE month = '1995-02' AND o_orderkey % 10 <> 0
    AND o_orderkey % 3 = 0
  UNION ALL
  SELECT 'insert', 2, o_orderkey FROM b WHERE month = '1995-03')
SELECT change_type, commit_version, count(*) AS n_changes,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM feed GROUP BY 1, 2 ORDER BY 1, 2
