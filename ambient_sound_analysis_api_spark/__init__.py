"""ambient_sound_analysis_api_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference service ``orcasound/ambient-sound-analysis-api`` (a FastAPI +
pandas wrapper over archived underwater-noise Parquet products), re-expressed
Spark-first:

- canonical **long-form** timeseries tables instead of wide pandas matrices
  (SURVEY.md §1.1) — band selection becomes a row filter, horizontal means
  become vertical aggregations;
- a **catalog table** replaces the reference's filename-scan inventory
  (reference ``app/services/get_options.py:86-140``);
- **global tumbling-window aggregation** (``groupBy(window(...))``) replaces
  sequential chunked reads + last-wins merge (reference
  ``app/services/get_aggregations.py:208-288``);
- driver-side Python keeps only what genuinely isn't relational: the
  auto-interval planner, request guards, and serving envelopes.

Beyond reference parity, `operators/` adds the large-scale training-data
pipeline surface: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search over embeddings, text analysis, multimodal binary-column
plumbing, and general relational ops (as-of join, windows, set ops).
"""

__version__ = "0.1.0"
