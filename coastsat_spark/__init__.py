"""coastsat_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query and data-processing capabilities of the reference
(kvos/CoastSat, a single-process NumPy/GDAL shoreline toolkit) as an
idiomatic Apache Spark DataFrame engine operating on Common-Crawl-style
web-page tables ``(url, warc_ts, html, text, lang)`` at web scale:

- hierarchical quad-cell spatial index (H3/S2-style) as materialized columns
  so Catalyst gets pruning/pushdown for free (SURVEY.md §4.2),
- raster<->vector kernels (band index, Otsu, marching squares, connected
  components) as vectorized pandas/Arrow UDFs over tile partitions,
- spatial joins (point-in-polygon, kNN, transect theta-join), as-of joins,
  dedup, despike and time-series aggregates as DataFrame compositions,
- large-scale training-data ops (MinHash-LSH dedup, SimHash, ANN cosine,
  language-ID, quality scoring) as first-class operators.

No code is copied from the reference; citations in docstrings are
``file:line`` pointers into ``/root/reference`` for behavioral parity only.
"""

__version__ = "0.1.0"
