SELECT c_custkey,
       upper(substr(c_name, 1, 8)) AS name_prefix,
       reverse(lower(c_name)) AS name_rev,
       lpad(c_custkey::VARCHAR, 10, '0') AS key_padded,
       regexp_extract(c_name, '([0-9]+)$', 1) AS name_digits,
       length(c_name) AS name_len
FROM customer ORDER BY c_custkey