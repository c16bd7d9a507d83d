WITH m AS (SELECT o_orderkey,
                  strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                    AS month,
                  'base' AS src
           FROM orders
           WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                   BETWEEN '1995-01' AND '1995-03'
             AND o_orderkey % 4 < 2),
s AS (
  SELECT 'o_orderkey' AS col_name, count(*) AS n,
         count(*) - count(o_orderkey) AS n_nulls,
         count(DISTINCT o_orderkey) AS ndv,
         CAST(min(o_orderkey) AS VARCHAR) AS min_value,
         CAST(max(o_orderkey) AS VARCHAR) AS max_value,
         sum(length(CAST(o_orderkey AS VARCHAR))) AS total_len
  FROM m
  UNION ALL
  SELECT 'month', count(*), count(*) - count(month),
         count(DISTINCT month),
         CAST(min(month) AS VARCHAR), CAST(max(month) AS VARCHAR),
         sum(length(CAST(month AS VARCHAR)))
  FROM m
  UNION ALL
  SELECT 'src', count(*), count(*) - count(src),
         count(DISTINCT src),
         CAST(min(src) AS VARCHAR), CAST(max(src) AS VARCHAR),
         sum(length(CAST(src AS VARCHAR)))
  FROM m)
SELECT col_name, CAST(n AS BIGINT) AS n_rows,
       CAST(n_nulls AS BIGINT) AS n_nulls,
       CAST(ndv AS BIGINT) AS ndv, min_value, max_value,
       CAST(total_len AS BIGINT) AS total_len,
       CAST(1 AS BIGINT) AS analyzed_version,
       CAST(1 AS BIGINT) AS current_version
FROM s ORDER BY col_name