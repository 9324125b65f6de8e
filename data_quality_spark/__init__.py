"""data_quality_spark — a from-scratch, PySpark-native data-quality and
training-data-pipeline engine.

Re-expresses the capabilities of the reference library (wmoore012/data_quality,
surveyed in SURVEY.md) as one-pass, Catalyst-optimised DataFrame jobs:

- validation rules compiled into a single fused aggregate per table
  (``rules.compile_rules`` — vs the reference's one-SQL-query-per-rule N+1
  pattern, ``/root/reference/src/data_quality/quality_scanner.py:75-99``),
- null / orphan / duplicate / completeness scans (``operators.scans``),
- medallion checkpoints + keep/drop deployment gates (``operators.gate``),
- the north-rule audio-clip + transcript quality-filter pipeline
  (``pipeline`` + ``functions.audio`` / ``functions.text``),
- large-scale training-data ops: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), ANN similarity search, text analysis
  (``operators.dedup``, ``operators.similarity``, ``functions.text``),
- partitioned sinks with per-partition lineage + metrics and
  checkpoint/resume (``sources.io``).

Everything here is built on public Apache Spark APIs only.
"""

from __future__ import annotations

__version__ = "0.1.0"
