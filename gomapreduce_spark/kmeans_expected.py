"""Precomputed k-means oracle (GENERATED — do not edit).

Source: tools/gen_kmeans_oracle.py (independent numpy reference,
self-checked against the live pipeline at generation time).
Valid ONLY at the scale factor below — check tooling degrades to
rows-only elsewhere instead of failing on stale literals.
"""

GENERATED_SF_DIR = '/root/testdata/sf0.01'

KMEANS_EXPECTED_SQL = '''
SELECT v.cluster_id::BIGINT AS cluster_id, v.n_points::BIGINT AS n_points,
       v.majority_label::BIGINT AS majority_label, v.purity::DOUBLE AS purity,
       v.inertia::DOUBLE AS inertia, v.c_norm::DOUBLE AS c_norm
FROM (VALUES
  (0, 53, 7, 0.169811, 48.970915, 0.277676),
  (1, 62, 0, 0.16129, 57.328557, 0.27407),
  (2, 55, 3, 0.163636, 50.87587, 0.270422),
  (3, 64, 3, 0.1875, 59.780662, 0.254414),
  (4, 57, 9, 0.157895, 53.052215, 0.2648),
  (5, 74, 0, 0.135135, 69.148189, 0.253897),
  (6, 74, 4, 0.189189, 69.15871, 0.255572),
  (7, 61, 8, 0.163934, 56.382173, 0.272582)
) AS v(cluster_id, n_points, majority_label, purity, inertia, c_norm)
WHERE EXISTS (SELECT 1 FROM embeddings)
'''
