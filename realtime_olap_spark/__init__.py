"""realtime_olap_spark — a PySpark-native realtime OLAP analytics engine.

A brand-new engine with the query and data-processing capabilities of a
segment-sharded realtime OLAP datastore (reference: gridgentoo/realtime-olap,
i.e. Apache Pinot ~2019), re-expressed Spark-first:

- tables are role-typed (dimension / metric / time) DataFrames over Parquet
  (reference schema model: pinot-common/.../data/FieldSpec.java:378-391);
- the query surface is selection / filter / aggregation / group-by with the
  reference's fixed function registry (SURVEY.md §2), evaluated by Catalyst;
- realtime ingest is Structured Streaming; hybrid tables stitch offline and
  realtime parts at a time boundary
  (pinot-broker/.../BaseBrokerRequestHandler.java:376-420);
- the star-tree pre-aggregation fast path is a materialized rollup table with
  engine-level routing (pinot-core/.../startree/v2/StarTreeV2.java:29);
- plus first-class large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) that the reference lacks.

Everything is DataFrame/Spark-SQL declarative so Catalyst/Tungsten pick the
physical strategy; no RDDs, no row-at-a-time Python in the hot path.
"""

from realtime_olap_spark.session import get_spark
from realtime_olap_spark.catalog import Catalog, TableConfig

__all__ = ["get_spark", "Catalog", "TableConfig"]
__version__ = "0.1.0"
