-- oracle for txn_pair: the transaction-committed fact+cumulative pair
-- read back through Txn.readAll must equal this from-scratch replay of
-- the final state — fact holds months 1995-01..02, the cumulative
-- table the per-month aggregates as of the second transaction.
WITH b AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
  WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m')
        BETWEEN '1995-01' AND '1995-02')
SELECT month, count(*) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS total_price,
       count(*) AS n_orders,
       CAST(sum(p) AS DOUBLE) AS cum_price
FROM b GROUP BY month ORDER BY month
