"""joern_ray — a Ray-Data-native knowledge-graph (code-property-graph)
construction engine over Common-Crawl-style webtext.

Re-expresses the capabilities of the reference Joern CPG builder
(/root/reference, see SURVEY.md) as idiomatic Ray Data pipelines:
``ray.data.read_parquet`` -> zero-copy Arrow ``map_batches`` stages ->
groupby/aggregate shuffles -> partitioned Parquet node/edge triple tables
with per-partition lineage manifests.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — the
driver (bench.py, tests/conftest.py, or the external harness) owns the
Ray session.
"""

__version__ = "0.1.0"
