"""logshipper_spark — a from-scratch PySpark-native analytics engine with the
query/data-processing capabilities of ``ondergetekende/logshipper``.

The reference is a per-message, dict-oriented gather → filter → mangle →
redistribute log pipeline (see SURVEY.md §1–§2).  This package re-expresses
that model Spark-first:

* messages            → rows of a fixed-schema DataFrame (transcripts table)
* pipeline (YAML)     → a spec compiled ONCE into a lazy Catalyst plan
* match/extract       → ``regexp_extract`` / vectorized pandas-UDF grok
* mangle (set/unset/rename/strip/replace/python) → pure column transforms
* lookup enrichment   → broadcast hash joins against dimension tables
* multi-sink routing  → sinks-array + explode, single-pass partitioned write
* statsd aggregates   → groupBy / window aggregations
* tail/stream inputs  → batch snapshot reads + Structured Streaming variant

Nothing here is a port: the reference executes row-at-a-time Python closures;
this engine builds declarative DataFrame plans and lets Catalyst/Tungsten
choose the physical strategy.
"""

from logshipper_spark.session import get_spark  # noqa: F401
from logshipper_spark.plans.spec import Pipeline, compile_pipeline  # noqa: F401

__version__ = "0.1.0"
