SELECT vec_id, len(embedding) AS dim,
       round(sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])), 4) AS l2_norm,
       round(list_max(embedding::DOUBLE[]), 4) AS max_component,
       round(list_min(embedding::DOUBLE[]), 4) AS min_component
FROM embeddings ORDER BY vec_id