"""Per-domain query-registry segments (split from the monolithic pipelines/queries.py in round 5); import rel_ray.pipelines.queries for the assembled QUERIES / ORACLE_SQL dicts."""
