SELECT o_orderpriority,
       count(*) AS n_orders,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderstatus = 'P') AS any_pending,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
       count(*) FILTER (WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01') AS n_recent
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority